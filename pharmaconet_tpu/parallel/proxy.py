"""Mesh-sharded docking-proxy inference: molecules shard over a ('data',) mesh.

The reference scores proxy batches on a single GPU
(/root/reference/src/pmnet_appl/sbddreward/proxy.py:54-72 and
tacogfn_reward/proxy.py, one scoring_list call per RL step); at serving
scale the molecule batch is the axis that grows. The network is small and
replicated; scoring is a pure map over molecules — so each device gets a
contiguous shard of the SMILES batch, every shard's flat graph arrays are
padded to identical (ng, Vp, Ep) shapes, and one jitted program vmaps the
proxy's precision-dispatched scoring forward over the sharded leading
axis. XLA partitions it with zero collectives in the score phase (same
SPMD shape as ShardedScreener / the DP trainer step).
"""

from __future__ import annotations

import inspect
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..proxy.data import _round_up, batch_graphs, half_octave, smi2graph_list
from .mesh import DATA_AXIS, data_mesh
from .modeling import _pad_axis0


class ShardedProxyScorer:
    """Fan a proxy's scoring batch over a device mesh.

    Wraps any proxy exposing the `_score_forward` / `_score_graphs` /
    `_cache` hooks (both SBDDReward_Proxy and TacoGFN_Proxy do). The
    wrapped proxy's invalid-SMILES contract is preserved: SBDDReward masks
    invalid entries to 0.0, TacoGFN raises. Falls back to the proxy's
    single-device path when the batch is too small to shard.
    """

    def __init__(self, proxy, mesh=None):
        self.proxy = proxy
        self.mesh = mesh if mesh is not None else data_mesh()
        self._programs: dict[tuple, object] = {}
        # TacoGFN's forward has no sigma head — detect, don't special-case
        self._has_sigma = (
            "return_sigma" in inspect.signature(proxy._score_forward).parameters
        )

    # mirror of the proxy's public API (base/proxy.py scoring_list)
    def scoring_list(self, target: str, smiles_list, return_sigma: bool = False):
        return self._scoring_list(self.proxy._cache[target], smiles_list, return_sigma)

    def scoring_iter(
        self,
        target: str,
        smiles_iter,
        batch_size: int = 2048,
        return_sigma: bool = False,
    ):
        """Stream scores for a long SMILES sequence in fixed-size batches,
        yielding one np.ndarray per batch. Host featurization of batch i+1
        runs on a worker thread while batch i's device program executes —
        the serving-loop overlap that scoring_list (one synchronous batch
        per call, like the reference RL loop) cannot express."""
        import itertools
        from concurrent.futures import ThreadPoolExecutor

        if return_sigma and not self._has_sigma:
            raise TypeError(f"{type(self.proxy).__name__} has no sigma head")
        cache = self.proxy._cache[target]
        dev_cache = self._dev_cache(cache)
        it = iter(smiles_iter)

        def take():
            return list(itertools.islice(it, batch_size)) or None

        with ThreadPoolExecutor(max_workers=1) as pool:
            batch = take()
            if batch is None:
                return
            fut = pool.submit(self._prepare, batch)
            while True:
                nxt = take()
                nxt_fut = pool.submit(self._prepare, nxt) if nxt is not None else None
                yield self._finish(dev_cache, cache, batch, fut.result(), return_sigma)
                if nxt_fut is None:
                    return
                batch, fut = nxt, nxt_fut

    def _scoring_list(self, cache, smiles_list, return_sigma: bool = False) -> np.ndarray:
        if return_sigma and not self._has_sigma:
            raise TypeError(f"{type(self.proxy).__name__} has no sigma head")
        smiles_list = list(smiles_list)
        prep = self._prepare(smiles_list)
        return self._finish(self._dev_cache(cache), cache, smiles_list, prep, return_sigma)

    @staticmethod
    def _dev_cache(cache):
        # device-array leaves traced, scalar stats (mu/std) static per target
        return tuple(
            float(c) if isinstance(c, float) else jnp.asarray(c) for c in cache
        )

    def _prepare(self, smiles_list: list) -> dict:
        """Host phase: featurize + shard + pad + stack. Pure numpy — no jax
        dispatch, so it is safe (and contention-free) on the prefetch
        worker thread while the main thread's device program runs. Returns
        the kwargs _finish needs."""
        n_dev = int(self.mesh.devices.size)
        maybe = smi2graph_list(smiles_list)
        graphs = [g for g in maybe if g is not None]
        flags = [g is not None for g in maybe]
        if len(graphs) != len(smiles_list) and self.proxy._invalid_smiles == "raise":
            bad = next(i for i, g in enumerate(maybe) if g is None)
            raise ValueError(f"unparseable SMILES: {smiles_list[bad]!r}")
        if not any(flags):
            return {"zeros": True}
        if len(graphs) < 2 * n_dev:
            # too few molecules to shard — hand the already-featurized
            # graphs to the proxy's single-device path
            return {"fallback": True, "graphs": graphs, "flags": flags}

        # contiguous shards; identical shapes across devices so the stacked
        # leading axis shards evenly
        bounds = np.linspace(0, len(graphs), n_dev + 1).astype(int)
        shards = [graphs[bounds[i] : bounds[i + 1]] for i in range(n_dev)]
        ng = half_octave(max(len(s) for s in shards))
        vp = _round_up(
            half_octave(max(sum(g.num_atoms for g in s) for s in shards), 128), 128
        )
        ep = _round_up(
            half_octave(max(sum(len(g.edge_src) for g in s) for s in shards), 128), 128
        )
        cat = self.proxy._graph_categorical
        arrays = []
        for s in shards:
            b = batch_graphs(s, num_graphs_pad=ng, num_atoms_pad=vp, num_edges_pad=ep)
            arrays.append((
                b.atom_class if cat else b.atom_features,
                b.atom_graph, b.atom_valid, b.edge_src, b.edge_dst,
                b.edge_class if cat else b.edge_features, b.edge_valid,
            ))
        stacked = tuple(np.stack([a[i] for a in arrays]) for i in range(7))
        return {
            "stacked": stacked,
            "shard_lens": [len(s) for s in shards],
            "flags": flags,
            "ng": ng,
        }

    def _finish(self, dev_cache, cache, smiles_list, prep, return_sigma) -> np.ndarray:
        """Device phase + score reassembly for one prepared batch."""
        if prep.get("zeros"):
            return np.zeros(len(smiles_list), dtype=np.float32)
        if prep.get("fallback"):
            if self._has_sigma:
                return self.proxy._score_graphs(
                    cache, prep["graphs"], prep["flags"], return_sigma
                )
            return self.proxy._score_graphs(cache, prep["graphs"], prep["flags"])
        stacked = tuple(jnp.asarray(a) for a in prep["stacked"])
        out = np.asarray(self._program(prep["ng"], return_sigma)(dev_cache, stacked))
        flags = prep["flags"]
        scores = np.concatenate(
            [out[i, :n] for i, n in enumerate(prep["shard_lens"])]
        ).astype(np.float32)
        if all(flags):
            return scores
        result = np.zeros(len(smiles_list), dtype=np.float32)
        result[np.asarray(flags)] = scores
        return result

    def _program(self, ng: int, return_sigma: bool):
        """One jitted sharded program per (ng, return_sigma); the jit cache
        handles the remaining (Vp, Ep) shape buckets."""
        key = (ng, return_sigma)
        prog = self._programs.get(key)
        if prog is not None:
            return prog
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(self.mesh, P())
        sharded = NamedSharding(self.mesh, P(DATA_AXIS))
        proxy = self.proxy
        has_sigma = self._has_sigma

        def run(cache, stacked7):
            def one(arrays7):
                if has_sigma:
                    return proxy._score_forward(cache, arrays7, ng, return_sigma)
                return proxy._score_forward(cache, arrays7, ng)

            return jax.vmap(one)(stacked7)

        prog = jax.jit(
            run,
            in_shardings=(replicated, sharded),
            out_shardings=sharded,
        )
        self._programs[key] = prog
        return prog


class ShardedCacheBuilder:
    """Build a proxy's per-target cache database with pockets fanned over
    the device mesh, the trunk and the proxy's pocket encoder FUSED into one
    per-pocket device program.

    The reference builds its 15,201-pocket CrossDocked2020 cache database
    strictly serially (base/proxy.py:223-236: parse -> PharmacoNet forward
    -> encoder, one pocket at a time), and its intermediate product — the
    multi-scale feature pyramid — is ~100 MB/pocket. Fusing the encoder
    into the sharded program means the pyramid never leaves the device:
    each mesh slot streams back only the tiny cache vectors (a few KB), so
    the build scales linearly with slice size and the host does parsing
    only. Per-pocket parse failures are tolerated exactly like the
    reference (log and continue).
    """

    def __init__(self, proxy, mesh=None):
        self.proxy = proxy
        self.mesh = mesh if mesh is not None else data_mesh()
        self._compiled: dict[tuple, object] = {}

    def _program(self, key: tuple):
        prog = self._compiled.get(key)
        if prog is not None:
            return prog
        from jax.sharding import PartitionSpec as P

        proxy = self.proxy
        pmnet = proxy.pmnet

        def one_pocket(args):
            ap, af, av, tk, tv, center = args
            with jax.default_matmul_precision(pmnet.matmul_precision):
                out = pmnet._device_program_impl(
                    ap, af, av, tk, tv, center, with_segmentation=False
                )
            # the serial path runs the encoder under f32 (base.get_cache)
            with jax.default_matmul_precision("float32"):
                parts = proxy._cache_device_parts(
                    out["pyramid"], out["token_features"], out["keep"]
                )
            parts["keep"] = out["keep"]
            return parts

        def shard_body(*arrs):
            return jax.lax.map(one_pocket, arrs)

        spec = P(DATA_AXIS)
        prog = jax.jit(
            jax.shard_map(
                shard_body, mesh=self.mesh, in_specs=(spec,) * 6, out_specs=spec
            )
        )
        self._compiled[key] = prog
        return prog

    def _parsed_chunks(self, pocket_info: dict, n_dev: int):
        """Yield (keys, datas) chunks of up to n_dev parsed pockets, lazily:
        host memory holds one chunk of ProteinData at a time (a 15k-pocket
        build must not materialize every parsed pocket up front). Parse
        failures are tolerated per pocket like the reference (log, skip)."""
        pmnet = self.proxy.pmnet
        keys, datas = [], []
        for key, (pdb_path, pocket_center) in pocket_info.items():
            try:
                if isinstance(pocket_center, (str, Path)):
                    data = pmnet.parse(pdb_path, ref_ligand_path=pocket_center)
                else:
                    data = pmnet.parse(pdb_path, center=pocket_center)
            except Exception as e:  # noqa: BLE001 - tolerant batch building
                print(key, e)
                continue
            keys.append(key)
            datas.append(data)
            if len(datas) == n_dev:
                yield keys, datas
                keys, datas = [], []
        if datas:
            yield keys, datas

    def get_cache_database(
        self,
        pocket_info: dict,
        save_path=None,
        verbose: bool = True,
    ) -> dict:
        """Same contract as BaseProxy.get_cache_database (key ->
        (protein_pdb_path, ref_ligand_path | center)), pockets sharded over
        the mesh. Parsing of the next chunk runs on a worker thread while
        the current chunk's device program executes."""
        from concurrent.futures import ThreadPoolExecutor

        proxy = self.proxy
        proxy.setup_pmnet()

        n_dev = int(self.mesh.devices.size)
        cache_dict: dict = {}
        progress = None
        if verbose:
            import tqdm

            progress = tqdm.tqdm(total=len(pocket_info))
        chunks = self._parsed_chunks(pocket_info, n_dev)
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(next, chunks, None)
            while True:
                item = fut.result()
                if item is None:
                    break
                fut = pool.submit(next, chunks, None)
                chunk_keys, chunk = item
                self._process_chunk(chunk_keys, chunk, n_dev, cache_dict)
                if progress is not None:
                    progress.update(len(chunk_keys))
        if progress is not None:
            progress.close()
        if save_path is not None:
            proxy._save_cache_file(cache_dict, save_path)
        return cache_dict

    def _process_chunk(self, chunk_keys, chunk, n_dev, cache_dict) -> None:
        # half-octave pad buckets bound the compiled-program count over a
        # long heterogeneous build
        a_pad = half_octave(max(d.atom_positions.shape[0] for d in chunk))
        t_pad = half_octave(max(d.tokens.shape[0] for d in chunk))

        def stack(get, pad_to):
            arrs = [_pad_axis0(np.asarray(get(d)), pad_to) if pad_to else
                    np.asarray(get(d)) for d in chunk]
            arrs += [np.zeros_like(arrs[0])] * (n_dev - len(chunk))
            return jnp.asarray(np.stack(arrs))

        batch = (
            stack(lambda d: d.atom_positions, a_pad),
            stack(lambda d: d.atom_features, a_pad),
            stack(lambda d: d.atom_valid, a_pad),
            stack(lambda d: d.tokens, t_pad),
            stack(lambda d: d.token_valid, t_pad),
            stack(lambda d: d.center, None),
        )
        out = self._program((a_pad, t_pad))(*batch)
        out = {k: np.asarray(v) for k, v in out.items()}
        for i, key in enumerate(chunk_keys):
            keep_idx = np.nonzero(out["keep"][i])[0]
            parts = {k: v[i] for k, v in out.items()}
            cache_dict[key] = self.proxy._cache_from_parts(
                parts, np.asarray(chunk[i].token_positions, np.float32), keep_idx
            )
