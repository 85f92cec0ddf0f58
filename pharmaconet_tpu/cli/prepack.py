"""Prepack a ligand library for repeated screening runs.

Parses + perceives every .sdf/.mol2 under a directory once and stores the
packed pharmacophore graphs as flat arrays (screening then starts directly
at the device phase; SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "prepack", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-d", "--library_dir", type=str, required=True,
                        help="ligand file directory (.sdf/.mol2)")
    parser.add_argument("-o", "--out", type=str, required=True,
                        help="output packed library (.npz)")
    parser.add_argument("--num_conformers", type=int, default=None,
                        help="cap conformers per ligand")
    parser.add_argument("--cpus", type=int, default=1,
                        help="worker processes for parsing")
    return parser


def main(args) -> int:
    from pharmaconet_tpu.scoring.library import build_library_from_files, save_library

    library = Path(args.library_dir)
    files = sorted(library.rglob("*.sdf")) + sorted(library.rglob("*.mol2"))
    print(f"packing {len(files)} ligand files ...")
    packed, names = build_library_from_files(files, args.num_conformers, cpus=args.cpus)
    save_library(args.out, packed, names)
    print(f"packed {len(packed)} ligands -> {args.out}")
    return 0


def entrypoint() -> int:
    return main(build_parser().parse_args())


if __name__ == "__main__":
    raise SystemExit(entrypoint())
