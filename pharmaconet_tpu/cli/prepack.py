"""Prepack a ligand library for repeated screening runs.

Two levels of prepacking:

1. Model-independent packed library (.npz): parse + perceive every
   .sdf/.mol2 under a directory once; screening starts at the device
   phase (SURVEY.md §7 hard-part 5).
2. Model-specific tile store (--tiles_out, needs --model): additionally
   run the one-pass C++ tile packer for a given pharmacophore model and
   store the final device arrays + host-tail metadata on disk
   (scoring/tiled_store.py). Screening then skips the per-batch host
   pack entirely — the production bottleneck (~150 ms/batch/core).

The reference has no equivalent: its screening re-parses every ligand
file per run in a fork pool (/root/reference/screening.py:46-75).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "prepack", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-d", "--library_dir", type=str,
                        help="ligand file directory (.sdf/.mol2)")
    parser.add_argument("--library", type=str,
                        help="existing packed library (.npz) to start from "
                             "(instead of -d)")
    parser.add_argument("--smiles", type=str,
                        help="SMILES library file ('SMILES [name]' per "
                             "line); conformers are embedded in-house "
                             "(instead of -d)")
    parser.add_argument("-o", "--out", type=str,
                        help="output packed library (.npz)")
    parser.add_argument("--num_conformers", type=int, default=None,
                        help="cap conformers per ligand (files) / conformers "
                             "to embed per SMILES (default 8)")
    parser.add_argument("--cpus", type=int, default=1,
                        help="worker processes for parsing")
    parser.add_argument("--seed", type=int, default=2025,
                        help="base conformer-embedding seed for --smiles; "
                        "entry i embeds with seed+i, so chunked runs stay "
                        "bit-identical to one big run when each chunk "
                        "passes seed+chunk_start")
    parser.add_argument("--embed_backend", type=str, default="auto",
                        choices=("auto", "numpy", "jax"),
                        help="--smiles conformer embedding: 'jax' runs the "
                             "whole distance-geometry pipeline on the "
                             "attached device (one dispatch per chunk), "
                             "'numpy' stays on host (multiprocess-friendly); "
                             "auto = device when attached and --cpus 1")

    tiles = parser.add_argument_group("tile store (model-specific)")
    tiles.add_argument("--tiles_out", type=str,
                       help="write a screen-ready tile store directory")
    tiles.add_argument("-p", "--pharmacophore_model", type=str,
                       help="pharmacophore model (.pm|.json) the tile store "
                            "is packed for")
    tiles.add_argument("--batch_size", type=int, default=2048,
                       help="ligands per stored batch")
    tiles.add_argument("--pack_threads", type=int, default=1,
                       help="host threads for the native tile packer")
    tiles.add_argument("--leaf_wire", type=str, default="sparse",
                       choices=("dense", "sparse"),
                       help="baked-leaf on-disk/wire format (v3 stores). "
                            "'sparse' (default) ships set-bit indices "
                            "instead of bit-planes — ~3x fewer leaf bytes "
                            "on real chemistry, 1.3x smaller store on disk "
                            "and on the host->device stream; the device "
                            "rebuilds the planes with one scatter per "
                            "bucket (+2 ms/2048-batch), scores equal to "
                            "'dense' (bit-identical on CPU, ULP-level on "
                            "TPU). 'dense' wins only when the store is "
                            "RAM-resident and the chain is compute-bound")
    tiles.add_argument("--tiles_version", type=int, default=3, choices=(2, 3),
                       help="store layout: 3 = block-major + deduplicated "
                            "group tables (default: ~4x smaller on disk, "
                            "~2x lower per-batch host tail via on-device "
                            "pair compaction), 2 = row-expanded gaussian "
                            "tables (fastest device kernel marginal; pick "
                            "when host cores and disk are plentiful)")

    param = parser.add_argument_group("screening weights (baked into tiles)")
    param.add_argument("--hydrophobic", type=float, default=1.0)
    param.add_argument("--aromatic", type=float, default=4.0)
    param.add_argument("--hba", type=float, default=4.0)
    param.add_argument("--hbd", type=float, default=4.0)
    param.add_argument("--halogen", type=float, default=4.0)
    param.add_argument("--anion", type=float, default=8.0)
    param.add_argument("--cation", type=float, default=8.0)
    return parser


def main(args) -> int:
    from pharmaconet_tpu.utils.compile_cache import enable_compile_cache

    # --smiles with the jax backend compiles one embed program per bucket
    # shape (chem/embed.py) — minutes of cold compile through a relay;
    # cache them like every other CLI does
    enable_compile_cache()

    from pharmaconet_tpu.scoring.library import (
        build_library_from_files,
        build_library_from_smiles,
        load_library,
        save_library,
    )

    if args.library:
        packed, names = load_library(args.library)
        print(f"loaded {len(packed)} prepacked ligands from {args.library}")
    elif args.smiles:
        packed, names = build_library_from_smiles(
            args.smiles, num_conformers=args.num_conformers or 8,
            cpus=args.cpus, embed_backend=args.embed_backend,
            seed=args.seed,
        )
        print(f"embedded + packed {len(packed)} SMILES from {args.smiles}")
    else:
        assert args.library_dir, (
            "provide -d/--library_dir, --library, or --smiles"
        )
        library = Path(args.library_dir)
        files = sorted(library.rglob("*.sdf")) + sorted(library.rglob("*.mol2"))
        print(f"packing {len(files)} ligand files ...")
        packed, names = build_library_from_files(
            files, args.num_conformers, cpus=args.cpus
        )
    if args.out:
        save_library(args.out, packed, names)
        print(f"packed {len(packed)} ligands -> {args.out}")

    if args.tiles_out:
        assert args.pharmacophore_model, (
            "--tiles_out needs -p/--pharmacophore_model (tile stores are "
            "model-specific)"
        )
        from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel
        from pharmaconet_tpu.scoring.batch_screen import PackedModel
        from pharmaconet_tpu.scoring.tiled_store import (
            write_tiled_store,
            write_v3_store,
        )

        weights = dict(
            Cation=args.cation, Anion=args.anion, Aromatic=args.aromatic,
            HBond_donor=args.hbd, HBond_acceptor=args.hba,
            Halogen=args.halogen, Hydrophobic=args.hydrophobic,
        )
        model = PackedModel.from_model(
            PharmacophoreModel.load(args.pharmacophore_model), weights
        )
        if args.tiles_version == 3:
            meta = write_v3_store(
                args.tiles_out, model, packed, names,
                batch_size=args.batch_size, threads=args.pack_threads,
                leaf_wire=args.leaf_wire,
            )
        else:
            meta = write_tiled_store(
                args.tiles_out, model, packed, names,
                batch_size=args.batch_size, threads=args.pack_threads,
            )
        shape = (
            f"T {meta['t']}, mn_cap {meta['mn_cap']}"
            if meta["version"] == 3 else f"width {meta['width']}"
        )
        print(
            f"tile store v{meta['version']}: {meta['n_batches']} batches of "
            f"{meta['batch_size']} ({shape}, cmax {meta['cmax']}) "
            f"-> {args.tiles_out}"
        )
    elif not args.out:
        raise SystemExit("nothing to do: provide -o and/or --tiles_out")
    return 0


def entrypoint() -> int:
    return main(build_parser().parse_args())


if __name__ == "__main__":
    raise SystemExit(entrypoint())
