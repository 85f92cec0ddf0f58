"""Weight conversion CLI: reference torch model.tar -> native .npz.

One-time conversion so inference hosts never need torch:

    python -m pharmaconet_tpu.cli.convert_weights model.tar model.npz

The .npz holds the flax parameter tree plus the per-type score
distributions (network/convert.py:284-303); PharmacoNet(weight_path=
"model.npz") loads it torch-free.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "convert reference PharmacoNet weights to the native npz format"
    )
    parser.add_argument("src", help="reference torch checkpoint (model.tar)")
    parser.add_argument("dst", help="output path (.npz)")
    return parser


def main(args) -> int:
    from pharmaconet_tpu.network.convert import (
        load_reference_checkpoint,
        save_npz_checkpoint,
    )

    params, distributions, _ = load_reference_checkpoint(args.src)
    save_npz_checkpoint(args.dst, params, distributions)
    import jax

    n_params = sum(int(x.size) for x in jax.tree.leaves(params))
    print(f"wrote {args.dst}: {n_params:,} parameters, "
          f"{len(distributions)} score distributions")
    return 0


def entrypoint() -> int:
    return main(build_parser().parse_args())


if __name__ == "__main__":
    raise SystemExit(entrypoint())
