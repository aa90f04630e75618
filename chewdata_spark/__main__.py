"""CLI entrypoint — the reference's ``chewdata '<config>'`` binary
(src/main.rs:24-117) as ``python -m chewdata_spark '<config>'``:

    echo '[{"a":1}]' | python -m chewdata_spark \\
        '[{"type":"r"},{"type":"t","actions":[...]},{"type":"w"}]'

- the single argument is a JSON or YAML step-list config (with
  ``{{ CHEWDATA_* }}`` env substitution);
- no argument runs the default passthrough ``[{"type":"r"},{"type":"w"}]``;
- readers/writers without a connector use stdin/stdout (cli connector).
"""

from __future__ import annotations

import sys

DEFAULT_PROCESSORS = '[{"type": "r"},{"type": "w"}]'


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    # reference CLI: `chewdata -f config.{json,hjson,yaml}` reads the
    # step list from a file (src/main.rs:73-111); config auto-detects
    # JSON vs YAML, which also covers common HJSON forms
    if argv and argv[0] in ("-V", "--version"):
        from chewdata_spark import __version__

        print(__version__)
        return 0
    if argv and argv[0] in ("-f", "--file"):
        if len(argv) < 2:
            print("usage: python -m chewdata_spark [-f CONFIG_FILE | 'CONFIG_JSON']", file=sys.stderr)
            return 2
        with open(argv[1], encoding="utf-8") as fh:
            config = fh.read()
    else:
        config = argv[0] if argv else DEFAULT_PROCESSORS

    from chewdata_spark.pipeline import Pipeline
    from chewdata_spark.session import get_spark

    spark = get_spark("chewdata-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        Pipeline.from_config(config, spark).run()
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
