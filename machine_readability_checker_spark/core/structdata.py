"""Structured-data harvest from HTML: JSON-LD and HTML microdata.

Web-curation pipelines mine schema.org annotations for supervised
signal (product/recipe/article/person records, ratings, dates) — the
same channel Common Crawl's WAT metadata and the public Web Data
Commons extraction expose.  Two carriers, both parsed with the stdlib:

- **JSON-LD**: ``<script type="application/ld+json">`` blocks, parsed
  with ``json`` and flattened per the public JSON-LD conventions
  (top-level arrays, ``@graph`` node lists, ``@type`` possibly a
  list).  Scalar-valued keys become properties; nested objects become
  their own items (bounded depth), with the parent property recording
  the child's ``@type``.
- **Microdata**: ``itemscope``/``itemtype``/``itemprop`` per the HTML
  microdata specification — property values come from ``content``
  (meta), ``href`` (a/area/link), ``src`` (img/audio/video/embed/
  iframe/source/track), ``data`` (object), ``value`` (data/meter),
  ``datetime`` (time), else the element's whitespace-normalized text
  content.  Nesting (``itemprop`` + ``itemscope`` on one element)
  records a separate child item, the parent property carrying the
  child's ``itemtype``.

Defensive by construction: malformed JSON blocks are skipped (never a
task failure), depth/size caps bound attacker-controlled nesting, and
the tag-soup tolerant ``html.parser`` base never raises on bad markup.

No reference analog (``/root/reference`` reads local spreadsheets);
this extends the crawl-curation family (``operators/pagemeta.py``).
"""

from __future__ import annotations

import json
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

#: HTML5 void elements: no end tag, must not advance the depth counter.
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

#: microdata value attribute per element (HTML spec §5.2.4); anything
#: else takes its text content.
_VALUE_ATTR = {
    "meta": "content",
    "audio": "src", "embed": "src", "iframe": "src", "img": "src",
    "source": "src", "track": "src", "video": "src",
    "a": "href", "area": "href", "link": "href",
    "object": "data",
    "data": "value", "meter": "value",
    "time": "datetime",
}

_MAX_ITEMS = 256
_MAX_JSONLD_DEPTH = 4
_MAX_JSONLD_BYTES = 1 << 20


def _ws(s: str) -> str:
    return " ".join(s.split())


class _StructuredCollector(HTMLParser):
    """One pass collecting JSON-LD script bodies and microdata items."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.jsonld_blocks: List[str] = []
        self.items: List[Dict] = []
        self._depth = 0
        self._scopes: List[Tuple[int, int]] = []  # (open_depth, item_idx)
        # open text-content captures: [open_depth, item_idx, names, parts]
        self._captures: List[list] = []
        self._in_jsonld = False
        self._jsonld_parts: List[str] = []

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        a = {k.lower(): ("" if v is None else v) for k, v in attrs}
        if tag == "script":
            typ = a.get("type", "").split(";")[0].strip().lower()
            self._in_jsonld = typ == "application/ld+json"
            self._jsonld_parts = []
        open_depth = self._depth
        itemscope = "itemscope" in a
        child_idx: Optional[int] = None
        if itemscope and len(self.items) < _MAX_ITEMS:
            self.items.append(
                {
                    "format": "microdata",
                    "type": _ws(a.get("itemtype", "")).split(" ")[0] or None,
                    "props": [],
                }
            )
            child_idx = len(self.items) - 1
        prop = _ws(a.get("itemprop", ""))
        if prop and self._scopes:
            parent_idx = self._scopes[-1][1]
            names = prop.split(" ")
            if child_idx is not None:
                # nested item: parent property records the child's type
                val = self.items[child_idx]["type"] or ""
                for nm in names:
                    self.items[parent_idx]["props"].append((nm, val))
            elif tag in _VALUE_ATTR:
                val = a.get(_VALUE_ATTR[tag], "").strip()
                if tag == "time" and not val:
                    self._captures.append([open_depth, parent_idx, names, []])
                else:
                    for nm in names:
                        self.items[parent_idx]["props"].append((nm, val))
            else:
                self._captures.append([open_depth, parent_idx, names, []])
        if child_idx is not None:
            self._scopes.append((open_depth, child_idx))
        if tag not in VOID_TAGS:
            self._depth += 1

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag == "script" and self._in_jsonld:
            self._in_jsonld = False
            block = "".join(self._jsonld_parts).strip()
            if block and len(block) <= _MAX_JSONLD_BYTES:
                self.jsonld_blocks.append(block)
        if tag in VOID_TAGS:
            return
        if self._depth > 0:
            self._depth -= 1
        d = self._depth
        while self._captures and self._captures[-1][0] == d:
            open_depth, item_idx, names, parts = self._captures.pop()
            val = _ws("".join(parts))
            for nm in names:
                self.items[item_idx]["props"].append((nm, val))
        while self._scopes and self._scopes[-1][0] == d:
            self._scopes.pop()

    def handle_data(self, data):
        if self._in_jsonld:
            self._jsonld_parts.append(data)
        for cap in self._captures:
            cap[3].append(data)


def _scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _flatten_jsonld(node, out: List[Dict], depth: int) -> Optional[str]:
    """Append ``node`` (and its nested entities) to ``out``; returns
    the node's ``@type`` so a parent property can reference it."""
    if not isinstance(node, dict) or depth > _MAX_JSONLD_DEPTH:
        return None
    if len(out) >= _MAX_ITEMS:
        return None
    t = node.get("@type")
    if isinstance(t, list):
        t = t[0] if t else None
    t = t if isinstance(t, str) else None
    item = {"format": "jsonld", "type": t, "props": []}
    out.append(item)
    nested = []
    for k, v in node.items():
        if k.startswith("@"):
            if k == "@graph" and isinstance(v, list):
                nested.extend(v)
            continue
        if isinstance(v, (str, int, float, bool)):
            item["props"].append((k, _scalar(v)))
        elif isinstance(v, dict):
            ct = v.get("@type")
            ct = ct[0] if isinstance(ct, list) and ct else ct
            item["props"].append((k, ct if isinstance(ct, str) else ""))
            nested.append(v)
        elif isinstance(v, list):
            for el in v:
                if isinstance(el, (str, int, float, bool)):
                    item["props"].append((k, _scalar(el)))
                elif isinstance(el, dict):
                    ct = el.get("@type")
                    ct = ct[0] if isinstance(ct, list) and ct else ct
                    item["props"].append(
                        (k, ct if isinstance(ct, str) else "")
                    )
                    nested.append(el)
    for child in nested:
        _flatten_jsonld(child, out, depth + 1)
    return t


def parse_structured_data(
    content: bytes, charset_hint: str = ""
) -> List[Dict]:
    """HTML bytes → ``[{format, type, props: [(name, value)]}]``:
    JSON-LD entities first (document order, parents before their
    nested entities), then microdata items in document order.
    Malformed JSON blocks are skipped; tag soup never raises."""
    from .html import sniff_charset

    enc = sniff_charset(content, charset_hint)
    p = _StructuredCollector()
    p.feed(content.decode(enc, errors="replace"))
    p.close()
    out: List[Dict] = []
    for block in p.jsonld_blocks:
        try:
            data = json.loads(block)
        except Exception:
            continue
        roots = data if isinstance(data, list) else [data]
        for node in roots:
            _flatten_jsonld(node, out, 0)
    out.extend(p.items)
    return out[:_MAX_ITEMS]
