#!/usr/bin/env python
"""Virtual screening entry point (see pharmaconet_tpu/cli/screening.py)."""

from pharmaconet_tpu.cli.screening import entrypoint

if __name__ == "__main__":
    raise SystemExit(entrypoint())
