"""Native (JVM-side) column functions — the scalar rule predicates of the
reference re-expressed as Catalyst expressions so they run inside
whole-stage codegen, never in Python."""
