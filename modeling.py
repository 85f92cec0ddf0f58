#!/usr/bin/env python
"""Pharmacophore modeling entry point (see pharmaconet_tpu/cli/modeling.py)."""

from pharmaconet_tpu.cli.modeling import entrypoint

if __name__ == "__main__":
    raise SystemExit(entrypoint())
