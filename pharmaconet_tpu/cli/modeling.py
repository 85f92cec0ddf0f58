"""Pharmacophore modeling CLI.

Mirrors /root/reference/modeling.py:17-257: RCSB download, ligand detection
with interactive selection, all-sites mode, manual center, output caching
unless --force, .pm/.json suffix, and PyMOL visualization (.pse with pymol
installed, .pml script otherwise).
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

SUCCESS, EXIT, FAIL = 0, 1, 2


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "pharmacophore modeling script",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    cfg = parser.add_argument_group("config")
    cfg.add_argument("--pdb", type=str, help="RCSB PDB code")
    cfg.add_argument("-l", "--ligand_id", type=str, help="RCSB ligand code")
    cfg.add_argument("-p", "--protein", type=str, help="custom path of protein pdb file (.pdb)")
    cfg.add_argument("-c", "--chain", type=str, help="chain")
    cfg.add_argument("-a", "--all", action="store_true", help="use all binding sites")
    cfg.add_argument("--out_dir", type=str, help="output directory. default: ./result/{PDBID|prefix}")
    cfg.add_argument("--prefix", type=str, help="task name. default: {PDBID}")
    cfg.add_argument("--suffix", choices=("pm", "json"), default="pm", help="model file extension")

    env = parser.add_argument_group("environment")
    env.add_argument("--weight_path", type=str, help="custom weight path (.npz or reference model.tar)")
    env.add_argument("--force", action="store_true", help="overwrite existing outputs")
    env.add_argument("--segmentation_precision", choices=("float32", "tensorfloat32", "bfloat16"),
                     default="tensorfloat32",
                     help="mask-decoder precision; the tensorfloat32 default matches the "
                          "reference's own GPU conv execution (cudnn allow_tf32=True)")
    env.add_argument("--precision", choices=("float32", "tensorfloat32", "bfloat16"),
                     default="float32",
                     help="matmul/conv precision: float32 matches the reference to 1e-4; "
                          "lower precisions trade parity for device latency")
    env.add_argument("--profile", type=str, metavar="DIR",
                     help="write a jax.profiler trace of the modeling run to DIR "
                          "(view with tensorboard / xprof)")
    env.add_argument("--shard", action="store_true",
                     help="use all local devices: with --all and multiple "
                          "uncached sites, one pocket per mesh slot "
                          "(ShardedModeler batch); otherwise each pocket's "
                          "hotspot axis fans out (ShardedSegmenter latency)")
    env.add_argument("-v", "--verbose", action="store_true", help="verbose")

    adv = parser.add_argument_group("advanced")
    adv.add_argument("--ref_ligand", type=str, help="ligand defining the box center (.sdf/.pdb/.mol2)")
    adv.add_argument("--center", nargs="+", type=float, help="box center coordinates")
    return parser


def main(args) -> int:
    from pharmaconet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import pharmaconet_tpu
    from pharmaconet_tpu.module import PharmacoNet
    from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel
    from pharmaconet_tpu.utils import visualize
    from pharmaconet_tpu.utils.rcsb import download_pdb, parse_pdb

    logging.info(pharmaconet_tpu.__description__)
    assert args.prefix is not None or args.pdb is not None, "MISSING PREFIX: `--prefix` or `--pdb`"
    prefix = args.prefix if args.prefix else args.pdb

    save_dir = Path(args.out_dir) if args.out_dir else Path("./result") / prefix
    save_dir.mkdir(exist_ok=True, parents=True)

    module = PharmacoNet(weight_path=args.weight_path, matmul_precision=args.precision,
                         segmentation_precision=args.segmentation_precision)
    logging.info("Load PharmacoNet finish")

    runner = module
    if args.shard:
        import jax

        if len(jax.devices()) > 1:
            from pharmaconet_tpu.parallel.modeling import ShardedSegmenter

            runner = ShardedSegmenter(module)
            logging.info(f"Sharding hotspot segmentation over {len(jax.devices())} devices")
        else:
            logging.info("--shard requested but only one device is visible; running single-device")

    if isinstance(args.pdb, str):
        protein_path = str(save_dir / f"{prefix}.pdb")
        if not os.path.exists(protein_path):
            logging.info(f"Download {args.pdb} to {protein_path}")
            if not download_pdb(args.pdb, protein_path):
                logging.error("download failed")
                return FAIL
        else:
            logging.info(f"Load {protein_path}")
    elif isinstance(args.protein, str):
        protein_path = args.protein
        assert os.path.exists(protein_path), protein_path
        logging.info(f"Load {protein_path}")
    else:
        raise SystemExit("Missing protein: `--pdb` or `--protein`")

    def run_pmnet(filename, ligand_path=None, center=None, model=None) -> PharmacophoreModel:
        model_path = save_dir / f"{filename}.{args.suffix}"
        pymol_path = save_dir / f"{filename}_pymol.pse"
        if model is not None:  # precomputed by the batched mesh path
            model.save(str(model_path))
            logging.info(f"Save pharmacophore model to {model_path}")
        elif (not args.force) and model_path.exists():
            logging.warning(f"Modeling pass - {model_path} exists")
            model = PharmacophoreModel.load(str(model_path))
        else:
            if args.profile:
                from pharmaconet_tpu.utils.profiling import trace

                with trace(args.profile):
                    model = runner.run(protein_path, ref_ligand_path=ligand_path, center=center)
                logging.info(f"Wrote device trace to {args.profile}")
            else:
                model = runner.run(protein_path, ref_ligand_path=ligand_path, center=center)
            model.save(str(model_path))
            logging.info(f"Save pharmacophore model to {model_path}")
        written = visualize.visualize_single(model, protein_path, ligand_path, prefix, str(pymol_path))
        logging.info(f"Save visualization to {written}")
        return model

    if args.ref_ligand is not None:
        assert os.path.exists(args.ref_ligand), args.ref_ligand
        run_pmnet(f"{prefix}_{Path(args.ref_ligand).stem}_model", ligand_path=args.ref_ligand)
        return SUCCESS

    if args.center is not None:
        assert len(args.center) == 3, "--center takes 3 coordinates"
        x, y, z = args.center
        run_pmnet(f"{prefix}_{x}_{y}_{z}_model", center=(x, y, z))
        return SUCCESS

    informs = parse_pdb(prefix, protein_path, save_dir)
    if len(informs) == 0:
        logging.warning("No ligand detected — enter the binding-site center:")
        x = float(input("x: "))
        y = float(input("y: "))
        z = float(input("z: "))
        run_pmnet(f"{prefix}_{x}_{y}_{z}_model", center=(x, y, z))
        return SUCCESS

    if args.all:
        logging.info("Use all binding sites (-a | --all)")
        # --shard with multiple sites: one pocket per mesh slot
        # (ShardedModeler.run_batch) instead of site-serial segmentation —
        # throughput mapping for the multi-site case; cached sites are
        # excluded from the batch
        precomputed = {}
        if args.shard:
            import jax

            keys = [f"{prefix}_{i.pdbchain}_{i.id}" for i in informs]
            todo = [
                (k, i) for k, i in zip(keys, informs)
                if args.force or not (save_dir / f"{k}_model.{args.suffix}").exists()
            ]
            if len(jax.devices()) > 1 and len(todo) > 1:
                from pharmaconet_tpu.parallel.modeling import ShardedModeler

                logging.info(
                    f"Batch-modeling {len(todo)} sites over "
                    f"{len(jax.devices())} devices"
                )
                models = ShardedModeler(module).run_batch(
                    [(protein_path, i.file_path, i.center) for _, i in todo]
                )
                precomputed = {k: m for (k, _), m in zip(todo, models)}

        model_dict = {}
        for inform in informs:
            key = f"{prefix}_{inform.pdbchain}_{inform.id}"
            model_dict[key] = (
                run_pmnet(f"{key}_model", inform.file_path, inform.center,
                          model=precomputed.get(key)),
                inform.file_path,
            )
        written = visualize.visualize_multiple(
            model_dict, protein_path, prefix, str(save_dir / f"{prefix}.pse")
        )
        logging.info(f"Save combined visualization to {written}")
        return SUCCESS

    text = "\n\n".join(str(i) for i in informs)
    logging.info(f"A total of {len(informs)} ligand(s) detected!\n{text}\n")

    if args.ligand_id is not None or args.chain is not None:
        informs = [
            i
            for i in informs
            if (args.ligand_id is None or args.ligand_id.upper() == i.id)
            and (args.chain is None or args.chain.upper() in (i.pdbchain, i.authchain))
        ]
        if not informs:
            logging.warning("No matching pattern!")
            return FAIL

    if len(informs) == 1:
        inform = informs[0]
        run_pmnet(f"{prefix}_{inform.pdbchain}_{inform.id}_model", inform.file_path, inform.center)
        return SUCCESS

    inform_by_order = {str(i.order): i for i in informs}
    logging.info("Select ligand number(s) (e.g. 1 ; 1,3 ; all ; exit)")
    while True:
        answer = input("ligand number: ").strip()
        if answer in ("all", "exit"):
            break
        if all(n.strip() in inform_by_order for n in answer.split(",")):
            break
        logging.warning(f"Invalid selection: {answer}")
    if answer == "exit":
        return EXIT
    selected = informs if answer == "all" else [inform_by_order[n.strip()] for n in answer.split(",")]
    for inform in selected:
        run_pmnet(f"{prefix}_{inform.pdbchain}_{inform.id}_model", inform.file_path, inform.center)
    return SUCCESS


def entrypoint() -> int:
    args = build_parser().parse_args()
    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO)
    return main(args)


if __name__ == "__main__":
    raise SystemExit(entrypoint())
