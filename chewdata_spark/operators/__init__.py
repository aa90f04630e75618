"""Operator library: chewdata step semantics + scale-pipeline operators.

- ``transformer``: the reference's action list (merge/replace/remove of
  templated fields) compiled to native Column expressions.
- ``validator``: named boolean rules → ``_error`` column assembly.
- ``generator``: synthetic record generation (``spark.range`` based).
- ``errors``: the Ok/Err error-channel dataflow as DataFrame filters.
- ``dedup`` / ``similarity`` / ``text`` / ``multimodal``: training-data
  pipeline operators beyond the reference surface.
"""
