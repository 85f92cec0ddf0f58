#!/usr/bin/env python
"""Feature extraction entry point (see pharmaconet_tpu/cli/feature_extraction.py)."""

from pharmaconet_tpu.cli.feature_extraction import entrypoint

if __name__ == "__main__":
    raise SystemExit(entrypoint())
