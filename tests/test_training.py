"""Developer-kit training tests: dataset -> trainer loop on a micro setup."""

import pickle

import numpy as np
import pytest

from pharmaconet_tpu.module import PharmacoNet
from pharmaconet_tpu.training.config import Config
from pharmaconet_tpu.training.trainer import Trainer

MICRO = dict(embed_dim=8, depths=(1, 1), num_heads=(1, 2), window=2, token_feature_dim=16)


@pytest.fixture(scope="module")
def train_setup(tmp_path_factory, protein_pdb, ref_ligand_pdb):
    root = tmp_path_factory.mktemp("devkit")
    pmnet = PharmacoNet(
        weight_path=None, score_threshold=0.0, verbose=False,
        max_hotspots=8, segmentation_chunk=4, grid_dim=16, model_kwargs=MICRO,
    )
    # open the cavity gate so the random micro net KEEPS hotspots: a
    # hotspot-less pocket gives the interaction-sum head an empty K axis
    # (prediction identically 0, zero gradients) — the convergence test
    # below exists to catch exactly that degeneracy
    pmnet.focus_threshold = 0.0
    center = pmnet.get_center(ref_ligand_pdb)

    protein_dir = root / "proteins"
    protein_dir.mkdir()
    codes = [f"pocket{i}" for i in range(4)]
    info_lines = []
    ligand_data = {}
    for code in codes:
        (protein_dir / f"{code}.pdb").write_text(open(protein_pdb).read())
        info_lines.append(f"{code},{center[0]},{center[1]},{center[2]}")
        ligand_data[code] = [
            ("l1", "c1ccccc1", -5.2),
            ("l2", "CCO", -3.1),
            ("l3", "CC(=O)O", -4.0),
        ]
    (root / "protein_info.csv").write_text("\n".join(info_lines))
    (root / "train_key.txt").write_text("\n".join(codes))
    with open(root / "ligand.pkl", "wb") as f:
        pickle.dump(ligand_data, f)

    config = Config()
    config.log_dir = str(root / "log")
    config.data.protein_info_path = str(root / "protein_info.csv")
    config.data.train_protein_code_path = str(root / "train_key.txt")
    config.data.protein_dir = str(protein_dir)
    config.data.ligand_path = str(root / "ligand.pkl")
    config.model.hidden_dim = 16
    config.model.ligand_num_convs = 2
    config.train.max_iterations = 3
    config.train.batch_size = 2
    config.train.split_ratio = 0.5
    config.train.val_every = 2
    config.train.save_every = 2
    config.train.log_every = 1
    config.train.print_every = 10
    config.train.center_noise = 0.0
    return config, pmnet


def test_trainer_fit(train_setup):
    config, pmnet = train_setup
    trainer = Trainer(config, pmnet=pmnet)
    assert len(trainer.train_dataset) == 2
    assert len(trainer.val_dataset) == 2
    trainer.fit()
    save_dir = trainer.save_dir
    assert (save_dir / "last.npz").exists()
    assert (save_dir / "best.npz").exists()
    metrics = (trainer.log_dir / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) >= 3
    # loss finite
    import json

    for line in metrics:
        record = json.loads(line)
        for key, value in record.items():
            if key.endswith("loss"):
                assert np.isfinite(value)


def test_config_yaml_roundtrip(tmp_path):
    config = Config()
    config.log_dir = "x"
    config.train.batch_size = 7
    config.model.hidden_dim = 42
    path = tmp_path / "cfg.yaml"
    config.save(path)
    loaded = Config.load(path)
    assert loaded.train.batch_size == 7
    assert loaded.model.hidden_dim == 42
    assert loaded.train.opt.lr == config.train.opt.lr


def test_trainer_resume(train_setup):
    """Full-state resume restores params/optimizer and continues."""
    import numpy as np

    config, pmnet = train_setup
    config.log_dir = config.log_dir + "_resume"
    trainer = Trainer(config, pmnet=pmnet)
    trainer.fit()
    ckpt = trainer.save_dir / "resume.ckpt"
    assert ckpt.exists()
    trainer2 = Trainer(config, pmnet=pmnet)
    it, epoch = trainer2.restore_state(ckpt)
    assert it >= 2
    import jax

    flat1 = jax.tree.leaves(trainer.params)
    flat2 = jax.tree.leaves(trainer2.params)
    # params at save time differ from final; check structure + finiteness
    assert len(flat1) == len(flat2)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat2)


def test_trainer_orbax_async_checkpoint(train_setup):
    """backend='orbax' saves asynchronously and restores the optax
    namedtuple opt_state with its structure intact (orbax alone would
    round-trip namedtuples into dicts and break optimizer.update)."""
    import jax
    import numpy as np

    config, pmnet = train_setup
    config.log_dir = config.log_dir + "_orbax"
    trainer = Trainer(config, pmnet=pmnet)
    items = [trainer.train_dataset[0].loss_args()]
    trainer.params, trainer.opt_state, _ = trainer._train_step(
        trainer.params, trainer.opt_state, items
    )
    trainer.save_state("async.ckpt", it=5, epoch=1, backend="orbax")
    trainer.wait_for_checkpoints()

    trainer2 = Trainer(config, pmnet=pmnet)
    it, epoch = trainer2.restore_state(trainer.save_dir / "async.ckpt")
    assert (it, epoch) == (5, 1)
    assert jax.tree.structure(trainer2.opt_state) == jax.tree.structure(
        trainer.opt_state
    )
    for a, b in zip(jax.tree.leaves(trainer.opt_state),
                    jax.tree.leaves(trainer2.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(trainer.params),
                    jax.tree.leaves(trainer2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # the restored optimizer state must actually step
    p, o, loss = trainer2._train_step(trainer2.params, trainer2.opt_state, items)
    assert np.isfinite(float(loss))


def test_train_step_converges(train_setup):
    """Overfitting one fixed batch must reduce the loss monotonically-ish
    (a wiring bug in grads/optimizer would leave it flat or diverging)."""
    config, pmnet = train_setup
    config.log_dir = config.log_dir + "_conv"
    trainer = Trainer(config, pmnet=pmnet)
    items = [trainer.train_dataset[0].loss_args()]
    params, opt_state = trainer.params, trainer.opt_state
    losses = []
    for _ in range(12):
        params, opt_state, loss = trainer._train_step(params, opt_state, items)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_dp_trainer_step_matches_single_device(train_setup):
    """The data-parallel Trainer step (items re-padded to common buckets,
    stacked, batch axis sharded over an 8-device mesh) produces the same
    loss and updated params as the per-item single-device step."""
    import jax

    from pharmaconet_tpu.parallel.mesh import data_mesh

    config, pmnet = train_setup
    config.log_dir = config.log_dir + "_dp"
    mesh = data_mesh()
    assert mesh.devices.size == 8
    trainer = Trainer(config, pmnet=pmnet, mesh=mesh)
    # 8 items (one per device) built from the 2 pockets, round-robin
    items = [trainer.train_dataset[i % 2] for i in range(8)]
    params0, opt0 = trainer.params, trainer.opt_state

    args = [i.loss_args() for i in items]
    params_ref, _, loss_ref = trainer._train_step(params0, opt0, args)
    params_dp, _, loss_dp = trainer.dp_step(params0, opt0, items)

    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_dp_trainer_fit(train_setup):
    """fit() drives the DP path end-to-end on a mesh (2 devices — the
    micro setup's batch_size is 2, and the DP step requires the batch to
    divide the mesh)."""
    import jax

    from pharmaconet_tpu.parallel.mesh import data_mesh

    config, pmnet = train_setup
    config.log_dir = config.log_dir + "_dpfit"
    trainer = Trainer(config, pmnet=pmnet, mesh=data_mesh(jax.devices()[:2]))
    trainer.fit()
    assert (trainer.save_dir / "last.npz").exists()
    metrics = (trainer.log_dir / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) >= 3


def test_train_step_compiles_once_per_bucket(train_setup):
    """Items whose ragged axes land in the same half-octave buckets must
    reuse ONE compiled train step (the point of the bucketed dataset)."""
    config, pmnet = train_setup
    config.log_dir = config.log_dir + "_jit"
    trainer = Trainer(config, pmnet=pmnet)
    items = [trainer.train_dataset[i].loss_args() for i in range(2)]
    params, opt_state = trainer.params, trainer.opt_state
    params, opt_state, _ = trainer._train_step(params, opt_state, [items[0]])
    base = trainer._train_step_jit._cache_size()
    params, opt_state, _ = trainer._train_step(params, opt_state, [items[1]])
    assert trainer._train_step_jit._cache_size() == base
