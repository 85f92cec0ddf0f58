"""End-to-end demo: pocket modeling -> pharmacophore model -> screening.

Runs everywhere (CPU or TPU) in under a minute by default: a micro
detector with random weights models the bundled 6OIM pocket, the
resulting pharmacophore model screens a small generated ligand library
through the overlapped executor, and the top hits print as CSV.

With the published checkpoint, drop model_kwargs/grid_dim/micro settings
and pass weight_path (or convert once via
`python -m pharmaconet_tpu.cli.convert_weights model.tar model.npz`):

    python examples/end_to_end.py --protein my.pdb --ref_ligand lig.sdf \
        --weights model.npz --full-arch
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("pharmaconet_tpu end-to-end demo")
    p.add_argument("--protein", default="/root/reference/examples/6OIM_protein.pdb")
    p.add_argument("--ref_ligand", default="/root/reference/examples/6OIM_D_MOV.pdb")
    p.add_argument("--weights", default=None, help=".npz or reference model.tar")
    p.add_argument("--out_dir", default="./result/end_to_end")
    p.add_argument("--n_ligands", type=int, default=60)
    p.add_argument("--full-arch", action="store_true",
                   help="published 64^3 architecture (needs real weights to be meaningful)")
    p.add_argument("--top", type=int, default=10)
    return p


def main(args) -> int:
    import numpy as np

    from pharmaconet_tpu.module import PharmacoNet
    from pharmaconet_tpu.scoring.batch_screen import BatchScreener, PackedLigand
    from pharmaconet_tpu.scoring.executor import ScreeningExecutor
    from pharmaconet_tpu.scoring.ligand import Ligand

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # 1. model the pocket
    if args.full_arch:
        pmnet = PharmacoNet(weight_path=args.weights)
    else:
        pmnet = PharmacoNet(
            weight_path=args.weights, score_threshold=0.0, verbose=False,
            max_hotspots=8, segmentation_chunk=4, grid_dim=16,
            model_kwargs=dict(embed_dim=8, depths=(1, 1), num_heads=(1, 2),
                              window=2, token_feature_dim=16),
        )
        pmnet.focus_threshold = 0.0  # random micro weights: open the gate
    model = pmnet.run(args.protein, ref_ligand_path=args.ref_ligand)
    pm_path = out_dir / "pocket_model.pm"
    model.save(str(pm_path))
    print(f"pharmacophore model: {len(model.nodes)} nodes -> {pm_path}")

    # 2. generate a small ligand library (stand-in for your .sdf/.mol2 dir)
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_cli_scale import _random_molecule, _to_sdf

    lib_dir = out_dir / "library"
    lib_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(7)
    paths = []
    for i in range(args.n_ligands):
        elements, coords, bonds = _random_molecule(rng)
        p = lib_dir / f"lig_{i:03d}.sdf"
        p.write_text(_to_sdf(p.stem, elements, coords, bonds))
        paths.append(p)

    # 3. parse + pack once, screen through the overlapped executor
    packed = [
        PackedLigand.from_ligand(Ligand.load_from_file(p)) for p in paths
    ]
    screener = BatchScreener(model)
    executor = ScreeningExecutor(screener, batch_size=32, pack_workers=2)
    scores = executor.score_packed(packed)

    ranked = sorted(zip(paths, scores), key=lambda x: x[1], reverse=True)
    csv = out_dir / "scores.csv"
    with open(csv, "w") as w:
        w.write("path,score\n")
        for p, s in ranked:
            w.write(f"{p},{s}\n")
    print(f"scored {len(ranked)} ligands -> {csv}")
    print(f"top {args.top}:")
    for p, s in ranked[: args.top]:
        print(f"  {s:10.4f}  {p.name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(build_parser().parse_args()))
