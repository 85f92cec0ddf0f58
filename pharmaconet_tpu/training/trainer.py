"""Proxy-head trainer on frozen PharmacoNet features.

Rebuilds developer/src/trainer.py:25-209 in JAX/optax:
  * Adam + LambdaLR 2^(-steps/decay) + global-norm grad clip
    (trainer.py:165-175)
  * periodic print/log/save/validate with best.pth/last semantics
    (fit loop, trainer.py:46-84) — checkpoints are flax-npz, metrics go to
    JSONL (and wandb when importable + active; neither tensorboard nor wandb
    ships in this environment)
  * the expensive frozen trunk runs per batch exactly like the reference
    (model.py:47); prefetching the next batch on the host overlaps parsing
    with device compute (the reference uses DataLoader workers)
"""

from __future__ import annotations

import functools
import json
import logging
import os
import random
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..network.convert import save_npz_checkpoint
from .affinity_model import DevAffinityModel
from .config import Config
from .dataset import PocketLigandDataset, collate_identity

logger = logging.getLogger("pharmaconet_tpu.trainer")


class _Prefetcher:
    """Background-thread batch preparation (the reference uses DataLoader
    worker processes, trainer.py:145-160; the frozen-trunk extraction here
    dispatches to the device asynchronously, so one thread suffices to
    overlap host parsing with device compute)."""

    def __init__(self, dataset, batch_size: int):
        self.dataset = dataset
        self.batch_size = batch_size

    def epoch(self):
        import queue
        import threading

        order = list(range(len(self.dataset)))
        random.shuffle(order)
        starts = list(range(0, len(order) - self.batch_size + 1, self.batch_size))
        q: queue.Queue = queue.Queue(maxsize=2)

        def worker():
            for start in starts:
                items = [self.dataset[i] for i in order[start : start + self.batch_size]]
                q.put(collate_identity(items))
            q.put(None)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
        thread.join()


class Trainer:
    """mesh: optional jax.sharding.Mesh with a 'data' axis. When given,
    fit() runs the data-parallel step: the per-pocket items of each batch
    are re-padded to common bucket shapes (training/dataset.repad_items),
    stacked on a leading batch axis sharded over 'data', with params and
    optimizer state replicated — XLA inserts the gradient all-reduce over
    ICI from the sharding annotations. This is the counterpart of scaling
    the reference's developer trainer (developer/src/trainer.py:46-84,
    15,201-pocket CrossDocked2020 runs) across a pod slice; the reference
    itself is single-device."""

    def __init__(self, config: Config, pmnet=None, mesh=None):
        self.mesh = mesh
        self.config = config
        self.log_dir = Path(config.log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.save_dir = self.log_dir / "save"
        self.save_dir.mkdir(parents=True, exist_ok=True)
        config.save(self.log_dir / "config.yaml")
        self._metrics_file = open(self.log_dir / "metrics.jsonl", "a")
        self._setup_logger()

        if pmnet is None:
            from ..api import get_pmnet_dev

            pmnet = get_pmnet_dev()
        self.pmnet = pmnet
        self.model = DevAffinityModel(
            hidden_dim=config.model.hidden_dim,
            ligand_num_convs=config.model.ligand_num_convs,
        )
        self.setup_data()
        self.setup_train()

    def _setup_logger(self):
        handler = logging.FileHandler(self.log_dir / "train.log")
        handler.setFormatter(logging.Formatter("%(asctime)s - %(message)s"))
        logger.addHandler(handler)
        logger.addHandler(logging.StreamHandler(sys.stdout))
        logger.setLevel(logging.INFO)

    # ------------------------------------------------------------------
    def setup_data(self):
        config = self.config
        protein_info = {}
        with open(config.data.protein_info_path) as f:
            for line in f:
                code, x, y, z = line.strip().split(",")
                protein_info[code] = (float(x), float(y), float(z))
        with open(config.data.train_protein_code_path) as f:
            codes = [ln.strip() for ln in f if ln.strip()]
        random.seed(0)
        random.shuffle(codes)
        split = int(len(codes) * config.train.split_ratio)
        self.train_dataset = PocketLigandDataset(
            codes[:split], protein_info, config.data.protein_dir,
            config.data.ligand_path, self.pmnet, config.train.center_noise,
        )
        self.val_dataset = PocketLigandDataset(
            codes[split:], protein_info, config.data.protein_dir,
            config.data.ligand_path, self.pmnet,
        )
        logger.info(f"train set: {len(self.train_dataset)}")
        logger.info(f"valid set: {len(self.val_dataset)}")

    def setup_train(self):
        opt = self.config.train.opt
        decay = self.config.train.lr_scheduler.lr_decay
        schedule = lambda step: opt.lr * 2.0 ** (-step / decay)  # noqa: E731
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(opt.clip_grad),
            optax.scale_by_adam(b1=opt.betas[0], b2=opt.betas[1], eps=opt.eps),
            optax.scale_by_schedule(lambda step: -schedule(step)),
        )
        example = self.train_dataset[0]
        self.params = self.model.init(jax.random.PRNGKey(0), *example.model_args())
        self.opt_state = self.optimizer.init(self.params)
        self._orbax = None  # lazy AsyncCheckpointer (backend='orbax')

        def loss_fn(params, item_args):
            return self.model.apply(params, *item_args, method="loss")

        # Jitted: the dataset buckets every ragged axis (hotspot count K
        # is exactly masked via hotspot_valid; ligand graphs pad to
        # half-octave buckets with loss-masked fakes), so one program
        # compiles per shape-bucket composition — not per pocket.
        @functools.partial(jax.jit, static_argnames=("static_items",))
        def train_step_jit(params, opt_state, array_items, static_items):
            def batch_loss(p):
                losses = []
                for (feats, hf, hp, ba7, aff, lv, hv), ng in zip(
                    array_items, static_items
                ):
                    losses.append(
                        loss_fn(p, (feats, hf, hp, (*ba7, ng), aff, lv, hv))
                    )
                return jnp.mean(jnp.stack(losses))

            loss, grads = jax.value_and_grad(batch_loss)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def train_step(params, opt_state, items):
            # per-pocket losses averaged (developer model.py:51-56).
            # loss_args() = (feats, hf, hp, batch_arrays, aff, lv,
            # hotspot_valid); batch_arrays' trailing num_graphs (a Python
            # int) becomes the static jit arg
            array_items = []
            static_items = []
            for a in items:
                feats, hf, hp, ba, aff, lv, hv = a
                array_items.append((tuple(feats), hf, hp, tuple(ba[:-1]), aff, lv, hv))
                static_items.append(int(ba[-1]))
            return train_step_jit(
                params, opt_state, tuple(array_items), tuple(static_items)
            )

        @functools.partial(jax.jit, static_argnames=("ng",))
        def eval_loss_jit(params, feats, hf, hp, ba7, aff, lv, hv, ng):
            return loss_fn(params, (feats, hf, hp, (*ba7, ng), aff, lv, hv))

        def eval_loss(params, item_args):
            feats, hf, hp, ba, aff, lv, hv = item_args
            return eval_loss_jit(
                params, tuple(feats), hf, hp, tuple(ba[:-1]), aff, lv, hv,
                ng=int(ba[-1]),
            )

        self._train_step = train_step
        self._train_step_jit = train_step_jit  # exposed for cache checks
        self._loss_fn = eval_loss

        if self.mesh is not None:
            self._dp_programs: dict[int, object] = {}

    # ------------------------------------------------------------------
    # Data-parallel step (mesh with a 'data' axis)
    # ------------------------------------------------------------------
    def _dp_program(self, ng: int):
        """One jitted DP program per ng (num_graphs is a Python int baked
        into the trace); the jit cache handles the remaining shape
        buckets."""
        prog = self._dp_programs.get(ng)
        if prog is not None:
            return prog
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(self.mesh, P())
        sharded = NamedSharding(self.mesh, P("data"))
        model, optimizer = self.model, self.optimizer

        def step(params, opt_state, batch):
            feats5, hf, hp, ba7, aff, lv, hv = batch

            def batch_loss(p):
                def one(f5, hf1, hp1, ba71, aff1, lv1, hv1):
                    return model.apply(
                        p, list(f5), hf1, hp1, (*ba71, ng), aff1, lv1,
                        hv1, method="loss",
                    )

                return jnp.mean(jax.vmap(one)(feats5, hf, hp, ba7, aff, lv, hv))

            loss, grads = jax.value_and_grad(batch_loss)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        prog = jax.jit(
            step,
            in_shardings=(replicated, replicated, sharded),
            out_shardings=(replicated, replicated, replicated),
        )
        self._dp_programs[ng] = prog
        return prog

    def dp_step(self, params, opt_state, items):
        """Run one data-parallel step on a batch of PocketItems."""
        from .dataset import repad_items

        n_dev = self.mesh.devices.size
        assert len(items) % n_dev == 0, (
            f"mesh size {n_dev} must divide the DP batch size {len(items)}"
        )
        items = repad_items(items)
        ng = int(items[0].batch_arrays[-1])
        feats5 = tuple(
            jnp.stack([jnp.asarray(i.multi_scale_features[lvl]) for i in items])
            for lvl in range(len(items[0].multi_scale_features))
        )
        hf = jnp.stack([jnp.asarray(i.hotspot_features) for i in items])
        hp = jnp.stack([jnp.asarray(i.hotspot_positions) for i in items])
        hv = jnp.stack([jnp.asarray(i.hotspot_valid) for i in items])
        ba7 = tuple(
            jnp.stack([jnp.asarray(i.batch_arrays[j]) for i in items])
            for j in range(7)
        )
        aff = jnp.stack([jnp.asarray(i.affinities) for i in items])
        lv = jnp.stack([jnp.asarray(i.ligand_valid) for i in items])
        batch = (feats5, hf, hp, ba7, aff, lv, hv)
        return self._dp_program(ng)(params, opt_state, batch)

    # ------------------------------------------------------------------
    def fit(self, resume_from: str | Path | None = None):
        cfg = self.config.train
        it, epoch = 1, 0
        if resume_from is not None:
            it, epoch = self.restore_state(resume_from)
            logger.info(f"resumed from {resume_from} at iteration {it}")
        best_loss = float("inf")
        prefetcher = _Prefetcher(self.train_dataset, cfg.batch_size)
        while it <= cfg.max_iterations:
            for items in prefetcher.epoch():
                if it > cfg.max_iterations:
                    break
                tick = time.time()
                if self.mesh is not None:
                    self.params, self.opt_state, loss = self.dp_step(
                        self.params, self.opt_state, items
                    )
                else:
                    args = [item.loss_args() for item in items]
                    self.params, self.opt_state, loss = self._train_step(
                        self.params, self.opt_state, args
                    )
                info = {"loss": float(loss), "time": time.time() - tick}
                if it % cfg.print_every == 0:
                    logger.info(
                        f"epoch {epoch} iteration {it} train : "
                        + " ".join(f"{k}:{v:.2f}" for k, v in info.items())
                    )
                if it % cfg.log_every == 0:
                    self.log(info, it, epoch, "train")
                if it % cfg.save_every == 0:
                    self.save_checkpoint(f"epoch-{epoch}-it-{it}.npz")
                    self.save_state(
                        "resume.ckpt", it, epoch,
                        backend=getattr(cfg, "checkpoint_backend", "pickle"),
                    )
                if it % cfg.val_every == 0:
                    val_info = self.evaluate()
                    self.log(val_info, it, epoch, "valid")
                    logger.info(
                        f"epoch {epoch} iteration {it} valid : "
                        + " ".join(f"{k}:{v:.2f}" for k, v in val_info.items())
                    )
                    if val_info["loss"] < best_loss:
                        self.save_checkpoint("best.npz")
                        best_loss = val_info["loss"]
                it += 1
            epoch += 1
        self.save_checkpoint("last.npz")
        self.wait_for_checkpoints()  # commit any in-flight async save

    def evaluate(self) -> dict[str, float]:
        losses = []
        for i in range(len(self.val_dataset)):
            item = self.val_dataset[i]
            losses.append(float(self._loss_fn(self.params, item.loss_args())))
        return {"loss": float(np.mean(losses)) if losses else float("nan")}

    # ------------------------------------------------------------------
    def log(self, info: dict, index: int, epoch: int, key: str):
        record = {f"{key}/{k}": v for k, v in info.items()}
        record.update({"step": index, "epoch": epoch})
        self._metrics_file.write(json.dumps(record) + "\n")
        self._metrics_file.flush()
        try:
            import wandb  # type: ignore[import-not-found]

            if wandb.run is not None:
                wandb.log(record, step=index)
        except ImportError:
            pass

    def save_checkpoint(self, filename: str):
        save_npz_checkpoint(
            self.save_dir / filename, jax.tree.map(np.asarray, self.params), {}
        )

    # ------------------------------------------------------------------
    # Full-state checkpointing (params + optimizer + progress). The
    # reference saves model weights only and cannot resume
    # (developer/src/trainer.py:177-182, SURVEY.md §5); this build can.
    # ------------------------------------------------------------------
    def save_state(
        self, filename: str, it: int, epoch: int, backend: str = "pickle"
    ) -> None:
        """backend='pickle' writes atomically (tmp + rename: a crash
        mid-save never corrupts the previous checkpoint — the exact
        scenario resume exists for). backend='orbax' saves the same tree
        asynchronously (device->host snapshot now, disk write off-thread)
        so the train loop never blocks on checkpoint IO."""
        # opt_state is an optax namedtuple tree; store flat leaves and
        # rebuild against the live treedef at restore time (orbax would
        # otherwise round-trip namedtuples into plain dicts)
        state = {
            "params": jax.tree.map(np.asarray, self.params),
            "opt_leaves": [np.asarray(x) for x in jax.tree.leaves(self.opt_state)],
            "iteration": it,
            "epoch": epoch,
        }
        path = self.save_dir / filename
        if backend == "orbax":
            import orbax.checkpoint as ocp

            if self._orbax is None:
                self._orbax = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            self._orbax.save(path.absolute(), state, force=True)
            return
        assert backend == "pickle", f"unknown checkpoint backend {backend!r}"
        import pickle

        tmp = path.with_name(path.name + ".tmp")
        with open(tmp, "wb") as w:
            pickle.dump(state, w)
        os.replace(tmp, path)

    def wait_for_checkpoints(self) -> None:
        """Block until any in-flight async (orbax) save has committed."""
        if self._orbax is not None:
            self._orbax.wait_until_finished()

    def restore_state(self, path) -> tuple[int, int]:
        """Resume from a full-state checkpoint (either backend);
        returns (iteration, epoch)."""
        path = Path(path)
        if path.is_dir():  # orbax checkpoints are directories
            import orbax.checkpoint as ocp

            state = ocp.PyTreeCheckpointer().restore(path.absolute())
        else:
            import pickle

            with open(path, "rb") as f:
                state = pickle.load(f)
        self.params = jax.tree.map(jnp.asarray, state["params"])
        if "opt_leaves" in state:
            leaves = state["opt_leaves"]
            if isinstance(leaves, dict):  # orbax may restore lists as dicts
                leaves = [leaves[k] for k in sorted(leaves, key=int)]
            self.opt_state = jax.tree.unflatten(
                jax.tree.structure(self.opt_state),
                [jnp.asarray(x) for x in leaves],
            )
        else:  # legacy full-tree pickle format
            self.opt_state = jax.tree.map(
                lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
                state["opt_state"],
            )
        return int(state["iteration"]), int(state["epoch"])
