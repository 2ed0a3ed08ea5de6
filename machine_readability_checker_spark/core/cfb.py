"""Minimal Compound File Binary (OLE2/CFB, MS-CFB spec) reader + writer.

Carries the legacy ``.xls`` lane: a BIFF8 workbook lives in the
``Workbook`` stream of a CFB container.  The reader follows FAT chains
(plus the mini-FAT for small streams in externally produced files); the
writer emits the simplest valid layout — one stream, 512-byte sectors,
stream padded past the mini-stream cutoff so no mini-FAT is needed.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

SECTOR = 512
HDR_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
MINI_CUTOFF = 4096


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from("<H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


def read_stream(data: bytes, name: str) -> Optional[bytes]:
    """Extract a named stream from a CFB container (case-sensitive;
    returns None if absent)."""
    if not data.startswith(HDR_MAGIC):
        return None
    sector_size = 1 << _u16(data, 30)
    mini_size = 1 << _u16(data, 32)
    n_fat = _u32(data, 44)
    dir_start = _u32(data, 48)
    mini_fat_start = _u32(data, 60)
    n_mini_fat = _u32(data, 64)
    difat_start = _u32(data, 68)
    n_difat = _u32(data, 72)

    def sector(idx: int) -> bytes:
        # per spec, sector i starts at (i+1)*sector_size: the header
        # occupies one full sector (4096 bytes in v4 files, not 512)
        off = (idx + 1) * sector_size
        return data[off : off + sector_size]

    # DIFAT: first 109 entries in header, then chained sectors
    difat: List[int] = [
        _u32(data, 76 + 4 * i) for i in range(109)
    ]
    nxt = difat_start
    for _ in range(n_difat):
        if nxt in (ENDOFCHAIN, FREESECT):
            break
        s = sector(nxt)
        difat.extend(_u32(s, 4 * i) for i in range((sector_size // 4) - 1))
        nxt = _u32(s, sector_size - 4)
    fat_sectors = [x for x in difat if x not in (FREESECT, ENDOFCHAIN)][:n_fat]

    fat: List[int] = []
    for fs in fat_sectors:
        s = sector(fs)
        fat.extend(_u32(s, 4 * i) for i in range(sector_size // 4))

    def chain(start: int) -> bytes:
        out = bytearray()
        idx = start
        seen = 0
        while idx not in (ENDOFCHAIN, FREESECT) and seen < len(fat) + 2:
            out += sector(idx)
            idx = fat[idx] if idx < len(fat) else ENDOFCHAIN
            seen += 1
        return bytes(out)

    directory = chain(dir_start)
    root_start = None
    target = None
    for off in range(0, len(directory) - 127, 128):
        entry = directory[off : off + 128]
        name_len = _u16(entry, 64)
        if name_len < 2:
            continue
        ename = entry[: name_len - 2].decode("utf-16le", "ignore")
        etype = entry[66]
        start = _u32(entry, 116)
        size = _u32(entry, 120)
        if etype == 5:  # root
            root_start = (start, size)
        elif ename == name:
            target = (start, size)
    if target is None:
        return None
    start, size = target

    if size >= MINI_CUTOFF:
        return chain(start)[:size]

    # mini-stream path
    if root_start is None:
        return None
    mini_stream = chain(root_start[0])[: root_start[1]]
    mini_fat: List[int] = []
    idx = mini_fat_start
    cnt = 0
    while idx not in (ENDOFCHAIN, FREESECT) and cnt < n_mini_fat:
        s = sector(idx)
        mini_fat.extend(_u32(s, 4 * i) for i in range(sector_size // 4))
        idx = fat[idx] if idx < len(fat) else ENDOFCHAIN
        cnt += 1
    out = bytearray()
    m = start
    guard = 0
    while m not in (ENDOFCHAIN, FREESECT) and guard < len(mini_fat) + 2:
        out += mini_stream[m * mini_size : (m + 1) * mini_size]
        m = mini_fat[m] if m < len(mini_fat) else ENDOFCHAIN
        guard += 1
    return bytes(out[:size])


def list_streams(data: bytes) -> List[str]:
    """Names of all stream (type-2) directory entries in a CFB
    container, in directory order; [] for non-CFB bytes.  Used by the
    content sniffer to split the legacy-Office subtypes (.doc vs .xls
    vs .ppt share one magic — the subtype lives in the stream names)."""
    if not data.startswith(HDR_MAGIC):
        return []
    try:
        sector_size = 1 << _u16(data, 30)
        dir_start = _u32(data, 48)
        n_fat = _u32(data, 44)
        difat = [_u32(data, 76 + 4 * i) for i in range(109)]
        fat_sectors = [
            x for x in difat if x not in (FREESECT, ENDOFCHAIN)
        ][:n_fat]
        fat: List[int] = []
        for fs in fat_sectors:
            off = (fs + 1) * sector_size
            s = data[off : off + sector_size]
            fat.extend(_u32(s, 4 * i) for i in range(len(s) // 4))
        names: List[str] = []
        idx = dir_start
        guard = 0
        while idx not in (ENDOFCHAIN, FREESECT) and guard < len(fat) + 2:
            off = (idx + 1) * sector_size
            directory = data[off : off + sector_size]
            for eoff in range(0, len(directory) - 127, 128):
                entry = directory[eoff : eoff + 128]
                name_len = _u16(entry, 64)
                if name_len < 2 or entry[66] != 2:
                    continue
                names.append(
                    entry[: name_len - 2].decode("utf-16le", "ignore")
                )
            idx = fat[idx] if idx < len(fat) else ENDOFCHAIN
            guard += 1
        return names
    except Exception:
        return []


def write_single_stream(name: str, payload: bytes) -> bytes:
    """Build a CFB container holding one stream.  The payload is padded
    to ≥4096 bytes so it lives in regular sectors (no mini-FAT)."""
    return write_streams({name: payload})


def write_streams(streams: Dict[str, bytes]) -> bytes:
    """Build a CFB container holding the given streams (insertion
    order preserved in the directory).  Every payload is padded to
    ≥4096 bytes so all streams live in regular FAT sectors — no
    mini-FAT — which keeps the writer tiny while staying spec-valid
    (readers must honor per-entry sizes, and ours records the PADDED
    size, which is what the fixture lanes' parsers tolerate)."""
    if not streams:
        raise ValueError("write_streams needs at least one stream")
    payloads: Dict[str, bytes] = {}
    for name, payload in streams.items():
        if len(payload) < MINI_CUTOFF:
            payload = payload + b"\x00" * (MINI_CUTOFF - len(payload))
        n_sec = (len(payload) + SECTOR - 1) // SECTOR
        payloads[name] = payload.ljust(n_sec * SECTOR, b"\x00")
    n_payload_sectors = sum(len(p) // SECTOR for p in payloads.values())
    n_entries = 1 + len(payloads)
    n_dir_sectors = (n_entries * 128 + SECTOR - 1) // SECTOR

    # layout: [FAT sectors][directory sectors][payload sectors, stream
    # by stream].  Smallest n_fat covering itself + directory + payloads
    # (the pre-refactor formulation recomputed n_fat from scratch each
    # iteration, clobbering the increment and hanging on ~12% of
    # payload sizes — keep the monotone loop).
    n_fat = 1
    while n_fat * (SECTOR // 4) < n_fat + n_dir_sectors + n_payload_sectors:
        n_fat += 1
    if n_fat > 109:
        # only the 109 header DIFAT slots are written; a bigger FAT would
        # need chained DIFAT sectors this fixture writer does not emit —
        # fail loudly rather than produce a silently-truncated container
        raise ValueError(
            f"payload needs {n_fat} FAT sectors > 109 header DIFAT slots "
            "(~6.9 MB max); the fixture writer does not chain DIFAT "
            "sectors"
        )
    fat_ids = list(range(n_fat))
    dir_id = n_fat
    payload_start = n_fat + n_dir_sectors

    fat = [FREESECT] * (n_fat * (SECTOR // 4))
    for fid in fat_ids:
        fat[fid] = 0xFFFFFFFD  # FATSECT
    for d in range(n_dir_sectors):
        fat[dir_id + d] = (
            dir_id + d + 1 if d < n_dir_sectors - 1 else ENDOFCHAIN
        )
    starts: Dict[str, int] = {}
    cursor = payload_start
    for name, payload in payloads.items():
        n_sec = len(payload) // SECTOR
        starts[name] = cursor
        for i in range(n_sec - 1):
            fat[cursor + i] = cursor + i + 1
        fat[cursor + n_sec - 1] = ENDOFCHAIN
        cursor += n_sec

    def dir_entry(ename: str, etype: int, start: int, size: int,
                  color: int = 1, left: int = FREESECT, right: int = FREESECT,
                  child: int = FREESECT) -> bytes:
        raw_name = ename.encode("utf-16le") + b"\x00\x00"
        e = bytearray(128)
        e[: len(raw_name)] = raw_name
        struct.pack_into("<H", e, 64, len(raw_name))
        e[66] = etype
        e[67] = color
        struct.pack_into("<I", e, 68, left)
        struct.pack_into("<I", e, 72, right)
        struct.pack_into("<I", e, 76, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    # directory: root (child → entry 1); stream entries chained as a
    # degenerate red-black "tree" via right-sibling links, which every
    # conformant reader walks (ours scans entries linearly anyway)
    names = list(payloads)
    entries = [dir_entry("Root Entry", 5, ENDOFCHAIN, 0, child=1)]
    for i, name in enumerate(names):
        entries.append(
            dir_entry(
                name, 2, starts[name], len(payloads[name]),
                right=(i + 2) if i + 1 < len(names) else FREESECT,
            )
        )
    while len(entries) % 4:
        entries.append(dir_entry("", 0, FREESECT, 0, color=0))
    directory = b"".join(entries)

    header = bytearray(SECTOR)
    header[:8] = HDR_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)        # 64-byte mini sectors
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_id)
    struct.pack_into("<I", header, 56, MINI_CUTOFF)
    struct.pack_into("<I", header, 60, ENDOFCHAIN)  # no mini-FAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * i,
            fat_ids[i] if i < len(fat_ids) else FREESECT,
        )

    out = bytearray(header)
    for chunk_start in range(0, len(fat), SECTOR // 4):
        sec = bytearray(SECTOR)
        for i, v in enumerate(fat[chunk_start : chunk_start + SECTOR // 4]):
            struct.pack_into("<I", sec, 4 * i, v)
        out += sec
    out += directory.ljust(n_dir_sectors * SECTOR, b"\x00")
    for name in names:
        out += payloads[name]
    return bytes(out)
