"""Virtual screening CLI.

Mirrors /root/reference/screening.py:9-75 (flags, library discovery, CSV
output) but replaces the fork-based multiprocessing pool with the TPU batch
screener: ligand files are parsed and packed on the host, then scored in
device batches (sharded over all local devices when more than one).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "scoring", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    cfg = parser.add_argument_group("config")
    cfg.add_argument("-p", "--pharmacophore_model", type=str, required=True,
                     help="path of pharmacophore model (.pm | .json)")
    cfg.add_argument("-d", "--library_dir", type=str,
                     help="molecular library directory path (.sdf/.mol2 files)")
    cfg.add_argument("--library", type=str,
                     help="prepacked ligand library (.npz from prepack.py)")
    cfg.add_argument("--library_tiles", type=str,
                     help="model-specific tile store directory "
                          "(prepack.py --tiles_out; skips the host pack)")
    cfg.add_argument("--smiles", type=str,
                     help="SMILES library file ('SMILES [name]' per line); "
                          "conformers embedded in-house (prefer prepack.py "
                          "--smiles for repeated screens)")
    cfg.add_argument("--num_conformers", type=int, default=8,
                     help="conformers to embed per SMILES (--smiles only)")
    cfg.add_argument("-o", "--out", type=str, required=True, help="result CSV path")
    cfg.add_argument("--batch_size", type=int, default=1024, help="ligands per device batch")
    cfg.add_argument("--cpus", type=int, default=1,
                     help="worker processes for ligand file parsing (scoring runs on device)")
    cfg.add_argument("--pack_threads", type=int, default=0,
                     help="host threads for the native batch packer "
                          "(0 = one per CPU)")

    param = parser.add_argument_group("parameter")
    param.add_argument("--hydrophobic", type=float, default=1.0, help="weight for hydrophobic carbon")
    param.add_argument("--aromatic", type=float, default=4.0, help="weight for aromatic ring")
    param.add_argument("--hba", type=float, default=4.0, help="weight for hbond acceptor")
    param.add_argument("--hbd", type=float, default=4.0, help="weight for hbond donor")
    param.add_argument("--halogen", type=float, default=4.0, help="weight for halogen atom")
    param.add_argument("--anion", type=float, default=8.0, help="weight for anion")
    param.add_argument("--cation", type=float, default=8.0, help="weight for cation")
    return parser


def main(args) -> int:
    from pharmaconet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    from pharmaconet_tpu.parallel.screening import ShardedScreener
    from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel
    from pharmaconet_tpu.scoring.batch_screen import BatchScreener
    from pharmaconet_tpu.scoring.ligand import Ligand

    model = PharmacophoreModel.load(args.pharmacophore_model)
    weights = dict(
        Cation=args.cation,
        Anion=args.anion,
        Aromatic=args.aromatic,
        HBond_donor=args.hbd,
        HBond_acceptor=args.hba,
        Halogen=args.halogen,
        Hydrophobic=args.hydrophobic,
    )
    pack_threads = args.pack_threads or os.cpu_count() or 1
    if len(jax.devices()) > 1:
        screener = ShardedScreener(model, weights, pack_threads=pack_threads)
    else:
        screener = BatchScreener(model, weights, pack_threads=pack_threads)

    results: list[tuple[str, float]] = []

    # crash recovery for long screens: batch results append to
    # <out>.partial as they complete (one "index,name,score" line per
    # ligand — keyed by library index so duplicate names stay distinct);
    # rerunning the same command skips ligands already scored there and
    # the final sorted CSV merges both
    def load_partial(partial_path: Path, names: list[str]) -> dict[int, float]:
        done: dict[int, float] = {}
        if partial_path.exists():
            for line in partial_path.read_text().splitlines():
                try:
                    idx_s, rest = line.split(",", 1)
                    name, score_s = rest.rsplit(",", 1)
                    idx, score = int(idx_s), float(score_s)
                except ValueError:
                    # torn last line from a hard crash — that ligand simply
                    # gets re-scored
                    continue
                if 0 <= idx < len(names) and names[idx] == name:
                    done[idx] = score  # index+name match ⇒ same library
            print(f"resuming: {len(done)} ligands already scored in {partial_path}")
        return done

    if args.library_tiles:
        # tile store: device arrays were packed at prepack time, so the
        # per-batch host work is just the pair-row gather + C++ DFS; batch
        # i+1 is dispatched (async) before batch i's tail runs, keeping
        # the device busy while the host post-processes
        from pharmaconet_tpu.scoring.tiled_store import TiledStore

        base_screener = screener  # stored batches dispatch on one device
        if not jax.devices()[0].device_kind.startswith("TPU"):
            # stored batches always run the fused Pallas kernel; off-TPU
            # (tests, CPU smoke runs) that means interpret mode
            base_screener.pallas_interpret = True
        store = TiledStore(args.library_tiles, base_screener.packed_model)
        names = store.names()
        print(f"tile store: {store.n_ligands} ligands in {store.n_batches} batches")

        partial_path = Path(args.out + ".partial")
        done = load_partial(partial_path, names)
        results.extend((names[i], s) for i, s in done.items())
        partial = open(partial_path, "a")

        def record(batch, scores):
            for (idx, name), score in zip(batch, scores):
                partial.write(f"{idx},{name},{score}\n")
                results.append((name, score))
            partial.flush()

        def emit_scores(scores, base):
            keys, vals = [], []
            for j, s in enumerate(scores):
                gi = base + j
                if gi not in done:
                    keys.append((gi, names[gi]))
                    vals.append(s)
            record(keys, vals)

        def emit(sb, rows, base):
            if rows is None:
                scores = [0.0] * sb.batch_len
            else:
                scores = base_screener.postprocess_stored(sb, rows)
            emit_scores(scores, base)

        todo_batches = [
            bi for bi in range(store.n_batches)
            if not all(
                bi * store.batch_size + j in done
                for j in range(min(store.batch_size,
                                   store.n_ligands - bi * store.batch_size))
            )
        ]
        n_dev = len(jax.devices())
        if isinstance(screener, ShardedScreener) and n_dev > 1:
            # mesh path: one stored batch per device per program (the
            # store's single shape makes stacking free); leftovers and
            # empty batches run singly
            group: list = []
            for bi, sb in store.iter_loaded(todo_batches):
                if sb.empty:
                    emit(sb, None, bi * store.batch_size)
                    continue
                group.append((bi, sb))
                if len(group) == n_dev:
                    scores_lists = screener.score_stored_group(
                        [s for _, s in group]
                    )
                    for (gbi, gsb), scores in zip(group, scores_lists):
                        emit_scores(scores, gbi * store.batch_size)
                    group = []
            for gbi, gsb in group:  # tail: single-device dispatch
                emit(gsb, base_screener.dispatch_stored(gsb),
                     gbi * store.batch_size)
        else:
            pending = None
            # prefetch thread pages batch i+1 in from disk while batch i
            # is on the device / in the host tail
            for bi, sb in store.iter_loaded(todo_batches):
                base = bi * store.batch_size
                rows = None
                if not sb.empty:
                    rows = base_screener.dispatch_stored(sb)
                if pending is not None:
                    emit(*pending)
                pending = (sb, rows, base)
            if pending is not None:
                emit(*pending)
        partial.close()
        partial_path.unlink()  # complete: the sorted CSV is the record
    elif args.library or args.smiles:
        # prepacked library: skip parsing/perception entirely; the executor
        # overlaps C++ packing (GIL-released worker threads) with device
        # dispatch + host postprocessing, preserving score order.
        # --smiles builds the same packed form in memory (embed + perceive
        # once up front), then screens identically.
        from pharmaconet_tpu.scoring.executor import ScreeningExecutor
        from pharmaconet_tpu.scoring.library import (
            build_library_from_smiles,
            load_library,
        )

        if args.library:
            packed, names = load_library(args.library)
            print(f"loaded {len(packed)} prepacked ligands")
        else:
            packed, names = build_library_from_smiles(
                args.smiles, num_conformers=args.num_conformers,
                cpus=args.cpus,
            )
            print(f"embedded + packed {len(packed)} SMILES")

        partial_path = Path(args.out + ".partial")
        done = load_partial(partial_path, names)
        todo = [
            (i, p, n)
            for i, (p, n) in enumerate(zip(packed, names))
            if i not in done
        ]
        results.extend((names[i], s) for i, s in done.items())

        partial = open(partial_path, "a")

        def record(batch, scores):
            for (idx, name), score in zip(batch, scores):
                partial.write(f"{idx},{name},{score}\n")
                results.append((name, score))
            partial.flush()

        if isinstance(screener, ShardedScreener):
            # mesh path: shard_map batches sequentially (each batch already
            # spans every device)
            for start in range(0, len(todo), args.batch_size):
                chunk = todo[start : start + args.batch_size]
                scores = screener.score_packed([p for _, p, _ in chunk])
                record([(i, n) for i, _, n in chunk], scores)
        else:
            executor = ScreeningExecutor(
                screener, batch_size=args.batch_size,
                pack_workers=max(1, min(4, pack_threads)),
            )
            todo_keys = [(i, n) for i, _, n in todo]

            def stream(start, scores):
                record(todo_keys[start : start + len(scores)], scores)

            executor.score_packed([p for _, p, _ in todo], on_batch=stream)
        partial.close()
        partial_path.unlink()  # complete: the sorted CSV is the record
    else:
        assert args.library_dir, (
            "provide -d/--library_dir, --library, --library_tiles, or --smiles"
        )
        library = Path(args.library_dir)
        files = sorted(library.rglob("*.sdf")) + sorted(library.rglob("*.mol2"))
        print(f"find {len(files)} molecules")

        batch_files: list[str] = []
        batch_ligands: list[Ligand] = []

        def flush():
            if not batch_ligands:
                return
            scores = screener.score_ligands(batch_ligands)
            results.extend(zip(batch_files, scores))
            batch_files.clear()
            batch_ligands.clear()

        from pharmaconet_tpu.scoring.parse_pool import iter_parsed

        for path_str, ligand in iter_parsed(files, cpus=args.cpus):
            batch_ligands.append(ligand)
            batch_files.append(path_str)
            if len(batch_ligands) >= args.batch_size:
                flush()
        flush()

    results.sort(key=lambda x: x[1], reverse=True)
    with open(args.out, "w") as w:
        w.write("path,score\n")
        for filename, score in results:
            w.write(f"{filename},{score}\n")
    return 0


def entrypoint() -> int:
    return main(build_parser().parse_args())


if __name__ == "__main__":
    raise SystemExit(entrypoint())
