"""One-command real-weight verification harness (VERDICT round 2, next #6).

The published PharmacoNet `model.tar` is not redistributable inside this
build environment, so converter correctness on REAL weights is unproven
until the artifact is present. This CLI is the harness for that day:

    python -m pharmaconet_tpu.cli.verify_checkpoint --checkpoint model.tar

runs, against an untouched reference checkout (default /root/reference):

  1. load+convert      — tar -> flax params; key coverage vs the published
                         architecture (reference module.py:82-93 schema)
  2. activation parity — the reference torch network itself is built,
                         loaded with the SAME weights, and every stage
                         (backbone stages, FPN pyramid, cavity/token
                         heads, step-1 segmentation) is diffed against our
                         flax forward at 64^3 (<=1e-4 + 2e-5 rel)
  3. modeling parity   — both create_density_maps pipelines run on a real
                         pocket (default: the bundled 6OIM example) from
                         identical parsed/voxelized tensors; hotspot
                         infos + .pm graphs diffed (utils/crosscheck.py)
  4. tf32 probe        — our mask decoder at tensorfloat32 vs float32 on
                         the kept hotspots: thresholded-voxel flips must
                         be zero on the real weights (round-2 measured 0
                         on synthesized weights; this re-checks)
  5. proxy convert     — optional --proxy .pth/.pt: structural conversion
                         via the tacogfn/sbddreward converters

Exit code 0 iff every runnable stage passes. Results also go to --out as
JSON. Works end-to-end with a SYNTHESIZED tar today (CI-tested), so the
harness itself cannot rot while waiting for the artifact.
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "verify_checkpoint", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    p.add_argument("--checkpoint", required=True, help="reference model.tar")
    p.add_argument("--protein", default="/root/reference/examples/6OIM_protein.pdb")
    p.add_argument("--ref_ligand", default="/root/reference/examples/6OIM_D_MOV.pdb")
    p.add_argument("--reference_src", default="/root/reference/src",
                   help="reference checkout (stage 2/3 skipped if absent)")
    p.add_argument("--out", default=None, help="JSON report path")
    p.add_argument("--proxy", default=None, help="optional proxy .pth/.pt")
    p.add_argument("--proxy_type", default="sbddreward",
                   choices=["sbddreward", "tacogfn"])
    p.add_argument("--skip_modeling", action="store_true",
                   help="skip the (slow) full-pocket modeling stage")
    return p


def _close(a, b, what, report, atol=1e-4, rtol=2e-5):
    import numpy as np

    a, b = np.asarray(a), np.asarray(b)
    diff = float(np.max(np.abs(a - b))) if a.size else 0.0
    bound = atol + rtol * float(np.max(np.abs(a))) if a.size else atol
    ok = a.shape == b.shape and diff <= bound
    report.append({"check": what, "ok": ok, "max_diff": diff, "bound": bound})
    return ok


def main(args) -> int:
    from pharmaconet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import os

    import numpy as np

    stages: list[dict] = []
    ok_all = True

    def stage(name, ok, **info):
        nonlocal ok_all
        ok_all = ok_all and ok
        stages.append({"stage": name, "ok": bool(ok), **info})
        print(f"[{'ok' if ok else 'FAIL'}] {name}: "
              + " ".join(f"{k}={v}" for k, v in info.items()))

    # ---------------- stage 1: load + convert --------------------------
    import torch

    from pharmaconet_tpu.network.convert import (
        convert_torch_state_dict,
        load_reference_checkpoint,
        synthesize_torch_state_dict,
    )

    raw = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    state = {k: v.numpy() for k, v in raw["model"].items()}
    # schema coverage BEFORE conversion: a drifted checkpoint must be
    # reported as such, not crash the converter halfway
    template = set(synthesize_torch_state_dict(seed=0))
    missing = sorted(template - set(state))
    unexpected = sorted(
        k for k in set(state) - template
        if not k.endswith(("relative_coords_table", "relative_position_index",
                           "attn_mask"))
    )
    if missing or unexpected:
        stage("load_convert", False, missing=missing[:5],
              unexpected=unexpected[:5])
        report = {"ok": False, "stages": stages}
        if args.out:
            with open(args.out, "w") as w:
                json.dump(report, w, indent=1)
        print("verify_checkpoint: FAIL (checkpoint schema drift)")
        return 1
    params, distributions, config = load_reference_checkpoint(args.checkpoint)
    stage(
        "load_convert", True,
        params=sum(np.asarray(v).size for v in state.values()),
        distributions=len(distributions),
    )

    ref_available = os.path.isdir(args.reference_src)

    # ---------------- stage 2: per-stage activation parity -------------
    if ref_available:
        import jax

        from pharmaconet_tpu.network.model import build_model
        from pharmaconet_tpu.utils.crosscheck import load_reference_network

        ref_net = load_reference_network(state, args.reference_src)
        flax_model = build_model(image_size=64)
        rng = np.random.default_rng(42)
        image = rng.normal(0, 1, (1, 33, 64, 64, 64)).astype(np.float32)
        tokens = np.concatenate(
            [rng.integers(0, 64, (8, 3)), rng.integers(0, 10, (8, 1))], axis=1
        ).astype(np.int32)
        checks: list[dict] = []
        with torch.no_grad():
            image_t = torch.from_numpy(image)
            tokens_t = torch.from_numpy(tokens)
            feats = ref_net.forward_feature(image_t)
            narrow, wide = ref_net.forward_cavity_extraction(feats[-1])
            scores_list, tf_list = ref_net.forward_token_prediction(
                feats[-1], [tokens_t]
            )
            per_box = [
                ref_net.forward_segmentation(
                    feats, [tokens_t[i : i + 1]], [tf_list[0][i : i + 1]]
                )[0][0].numpy()
                for i in range(len(tokens))
            ]

        def t2j(x):
            a = x.detach().numpy()
            return np.transpose(a, (0, 2, 3, 4, 1)) if a.ndim == 5 else a

        image_j = np.ascontiguousarray(np.transpose(image, (0, 2, 3, 4, 1)))
        with jax.default_matmul_precision("float32"):
            pyramid = flax_model.apply(params, image_j, method="forward_feature")
            narrow_j, wide_j = flax_model.apply(
                params, pyramid[-1], method="forward_cavity_extraction"
            )
            logits_j, tf_j = flax_model.apply(
                params, pyramid[-1], tokens, method="forward_token_prediction"
            )
            masks_j = flax_model.apply(
                params, pyramid, tokens, tf_j, method="forward_segmentation"
            )
        ok = True
        for i, (r, o) in enumerate(zip(feats, pyramid)):
            ok &= _close(t2j(r), np.asarray(o), f"pyramid[{i}]", checks)
        ok &= _close(t2j(narrow), np.asarray(narrow_j), "cavity_narrow", checks)
        ok &= _close(t2j(wide), np.asarray(wide_j), "cavity_wide", checks)
        ok &= _close(scores_list[0].numpy(), np.asarray(logits_j), "token_logits", checks)
        ok &= _close(tf_list[0].numpy(), np.asarray(tf_j), "token_features", checks)
        ok &= _close(
            np.concatenate(per_box, axis=0), np.asarray(masks_j),
            "segmentation", checks,
        )
        worst = max(checks, key=lambda c: c["max_diff"] / max(c["bound"], 1e-12))
        stage("activation_parity", ok, checks=len(checks),
              worst=f"{worst['check']}:{worst['max_diff']:.2e}")
    else:
        stage("activation_parity", True, skipped="reference src absent")

    # ---------------- stage 3+4: pocket modeling + tf32 probe ----------
    if not args.skip_modeling:
        from pharmaconet_tpu.module import PharmacoNet
        from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel

        pm = PharmacoNet(weight_path=args.checkpoint, verbose=False)
        data = pm.parse(args.protein, ref_ligand_path=args.ref_ligand)
        our_infos = pm.create_density_maps(data)
        our_model = PharmacophoreModel.create(
            data.pdbblock, data.center, our_infos, size=pm.grid_dim
        )
        stage("our_modeling", len(our_infos) > 0,
              hotspots=len(our_infos), nodes=len(our_model.nodes))

        if ref_available:
            from pharmaconet_tpu.utils.crosscheck import (
                compare_graphs,
                compare_hotspot_infos,
                import_reference_module,
                load_reference_network,
                make_reference_pharmaconet,
                reference_protein_data,
            )

            ref_module, ref_pm_mod = import_reference_module(args.reference_src)
            ref = make_reference_pharmaconet(
                ref_module, load_reference_network(state, args.reference_src),
                distributions, pm.score_threshold,
            )
            ref_infos = ref.create_density_maps(reference_protein_data(data))
            rep = compare_hotspot_infos(our_infos, ref_infos, raise_on_fail=False)
            stage("modeling_parity", not rep["mismatches"],
                  ours=rep["ours"], theirs=rep["theirs"],
                  max_map_diff=f"{rep['max_point_map_diff']:.2e}",
                  mismatches=rep["mismatches"][:5])
            center = tuple(float(v) for v in data.center)
            ref_model = ref_pm_mod.PharmacophoreModel.create(
                data.pdbblock, center, ref_infos
            )
            grep = compare_graphs(our_model, ref_model, raise_on_fail=False)
            node_edge = [m for m in grep["mismatches"]
                         if not m.startswith("cluster")]
            stage("graph_parity", not node_edge, nodes=grep["nodes"],
                  edges=grep["edges"], issues=node_edge[:5])

        # tf32 decoder deviation on the real weights
        pm_tf32 = PharmacoNet(weight_path=args.checkpoint, verbose=False,
                              segmentation_precision="tensorfloat32")
        pm_f32 = PharmacoNet(weight_path=args.checkpoint, verbose=False,
                             segmentation_precision="float32")
        infos_a = pm_tf32.create_density_maps(data)
        infos_b = pm_f32.create_density_maps(data)
        flips = -1
        if len(infos_a) == len(infos_b):
            flips = sum(
                int(np.sum((np.asarray(a["point_map"]) > 0)
                           != (np.asarray(b["point_map"]) > 0)))
                for a, b in zip(infos_a, infos_b)
            )
        max_delta = max(
            (float(np.abs(np.asarray(a["point_map"])
                          - np.asarray(b["point_map"])).max())
             for a, b in zip(infos_a, infos_b)),
            default=0.0,
        )
        stage("tf32_probe", flips == 0, thresholded_voxel_flips=flips,
              max_density_delta=f"{max_delta:.2e}")

    # ---------------- stage 5: proxy checkpoint ------------------------
    if args.proxy:
        try:
            proxy_state = torch.load(
                args.proxy, map_location="cpu", weights_only=False
            )
            if isinstance(proxy_state, dict) and "model" in proxy_state:
                proxy_state = proxy_state["model"]
            proxy_state = {k: np.asarray(v) for k, v in proxy_state.items()}
            if args.proxy_type == "sbddreward":
                from pharmaconet_tpu.proxy.sbddreward import (
                    convert_sbddreward_checkpoint,
                )

                converted = convert_sbddreward_checkpoint(proxy_state)
            else:
                from pharmaconet_tpu.proxy.tacogfn import (
                    convert_tacogfn_checkpoint,
                )

                converted = convert_tacogfn_checkpoint(proxy_state)
            import jax

            n = sum(x.size for x in jax.tree.leaves(converted))
            stage("proxy_convert", n > 0, params=n, type=args.proxy_type)
        except Exception as e:  # noqa: BLE001 - report, don't crash
            stage("proxy_convert", False, error=str(e)[:200])

    report = {"ok": ok_all, "stages": stages}
    if args.out:
        with open(args.out, "w") as w:
            json.dump(report, w, indent=1)
    print(f"verify_checkpoint: {'PASS' if ok_all else 'FAIL'}")
    return 0 if ok_all else 1


def entrypoint() -> int:
    return main(build_parser().parse_args())


if __name__ == "__main__":
    raise SystemExit(entrypoint())
