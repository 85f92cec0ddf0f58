#!/usr/bin/env python
"""Library prepacking entry point (see pharmaconet_tpu/cli/prepack.py)."""

from pharmaconet_tpu.cli.prepack import entrypoint

if __name__ == "__main__":
    raise SystemExit(entrypoint())
