"""CLI entry point: ``python -m elvis_tpu.cli [--config cfg.json] [--flags]``.

Flag surface mirrors the reference's ``python elvis.py`` CLI
(elvis.py:4940-5005): every config field is a flag, plus --config JSON,
merged defaults -> file -> flags.
"""

from __future__ import annotations

import sys

from elvis_tpu.pipeline import load_config_from_cli, run_elvis


def main(argv=None) -> int:
    config = load_config_from_cli(argv)
    run_elvis(config)
    return 0


if __name__ == "__main__":
    sys.exit(main())
