"""Epoch-driven Trainer (reference: espnet2/train/trainer.py:75 Trainer.run).

Drives the jitted functional train/eval steps over iterator factories,
aggregates stats in the Reporter, checkpoints with n-best symlinks +
GC, early-stops on patience, and averages n-best params at the end.

SPMD: batches are sharded over the mesh's "data" axis before each step;
params/opt-state are replicated (or sharded per the model's pjit specs).
Every host sees an identical batch schedule (epoch-seeded), so no
iterator-stop collective is needed (SURVEY §5.8 note).
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from espnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from espnet_tpu.train.checkpoint import (
    average_nbest,
    gc_old_epochs,
    load_checkpoint,
    load_checkpoint_meta,
    save_checkpoint,
    save_epoch_params,
    update_best_symlink,
)
from espnet_tpu.train.reporter import Reporter
from espnet_tpu.train.train_state import TrainState, make_eval_step, make_train_step

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(
        self,
        model,
        tx,
        expdir: str,
        max_epoch: int = 10,
        patience: Optional[int] = None,
        keep_nbest: int = 5,
        best_key: str = "loss",
        best_phase: str = "valid",
        best_mode: str = "min",
        log_interval: int = 50,
        mesh=None,
        use_tensorboard: bool = False,
        scheduler_on_valid: Optional[Callable] = None,
    ):
        self.model = model
        self.tx = tx
        self.expdir = Path(expdir)
        self.expdir.mkdir(parents=True, exist_ok=True)
        self.max_epoch = max_epoch
        self.patience = patience
        self.keep_nbest = keep_nbest
        self.best_key = best_key
        self.best_phase = best_phase
        self.best_mode = best_mode
        self.log_interval = log_interval
        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = 0
        self.reporter = Reporter()
        self.train_step = jax.jit(make_train_step(model, tx), donate_argnums=0)
        self.eval_step = jax.jit(make_eval_step(model))
        self.start_epoch = 1
        self.scheduler_on_valid = scheduler_on_valid
        self.tb = None
        if use_tensorboard:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(str(self.expdir / "tensorboard"))

    def init_state(self, variables: Dict, seed: int = 0) -> TrainState:
        # copy: train_step donates the state, which would otherwise delete
        # the caller's `variables` buffers (they alias on same-device put)
        import jax.numpy as jnp

        variables = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), variables
        )
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        state = TrainState.create(
            params, self.tx, jax.random.PRNGKey(seed), extra_vars=extra
        )
        self.seed = seed
        return self.shard_state(state)

    def shard_state(self, state: TrainState) -> TrainState:
        """Place the train state on the mesh: params per the tensor-
        parallel rules (replicated when the model axis is 1), optimizer
        moments sharded like their params, the rest replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from espnet_tpu.parallel.partitioning import (
            infer_opt_state_shardings,
            infer_param_shardings,
        )

        if self.mesh.shape.get("model", 1) <= 1:
            return replicate(state, self.mesh)
        param_sh = infer_param_shardings(state.params, self.mesh)
        opt_sh = infer_opt_state_shardings(
            state.opt_state, state.params, param_sh, self.mesh
        )
        rep = NamedSharding(self.mesh, P())
        state_sh = state.replace(
            step=rep,
            params=param_sh,
            extra_vars=jax.tree_util.tree_map(lambda _: rep, state.extra_vars),
            opt_state=opt_sh,
            rng=rep,
        )
        return jax.device_put(state, state_sh)

    def resume(self, state: TrainState) -> TrainState:
        ckpt = self.expdir / "checkpoint.ckpt"
        if ckpt.exists():
            state = load_checkpoint(ckpt, state)
            meta = load_checkpoint_meta(ckpt)
            self.start_epoch = int(meta.get("epoch", 0)) + 1
            if "reporter" in meta:
                self.reporter.load_state_dict(meta["reporter"])
            logger.info("resumed from %s at epoch %d", ckpt, self.start_epoch)
            state = self.shard_state(state)
        return state

    def run(
        self,
        state: TrainState,
        train_iter_factory: Callable[[int], Iterable],
        valid_iter_factory: Callable[[int], Iterable],
    ) -> TrainState:
        from espnet_tpu.data.prefetch import prefetch

        for epoch in range(self.start_epoch, self.max_epoch + 1):
            with prefetch(train_iter_factory(epoch)) as it:
                state = self.train_one_epoch(state, it, epoch)
            with prefetch(valid_iter_factory(epoch)) as it:
                self.validate_one_epoch(state, it, epoch)

            # checkpoint + best bookkeeping (rank-0 semantics: single ctrl)
            if jax.process_index() == 0:
                save_epoch_params(self.expdir, epoch, state.params)
                save_checkpoint(
                    self.expdir / "checkpoint.ckpt",
                    state,
                    meta={"epoch": epoch, "reporter": self.reporter.state_dict()},
                )
                update_best_symlink(self.expdir, epoch, "latest")
                best = self.reporter.best_epoch(
                    self.best_phase, self.best_key, self.best_mode
                )
                if best == epoch:
                    update_best_symlink(
                        self.expdir,
                        epoch,
                        f"{self.best_phase}.{self.best_key}.best",
                    )
                keep = [
                    e
                    for e, _ in self.reporter.sorted_epochs(
                        self.best_phase, self.best_key, self.best_mode
                    )[: self.keep_nbest]
                ]
                gc_old_epochs(self.expdir, keep)
                self.reporter.save_json(self.expdir / "report.json")

            if self.scheduler_on_valid is not None:
                val = self.reporter.get(epoch, self.best_phase, self.best_key)
                state = self.scheduler_on_valid(state, epoch, val, self.reporter)

            if self.patience is not None and self.reporter.check_early_stopping(
                self.patience, self.best_phase, self.best_key, self.best_mode
            ):
                logger.info("early stopping at epoch %d", epoch)
                break
        return state

    def _put_batch(self, batch):
        """Host-local batch → mesh-sharded global arrays. Multi-host:
        every host loads its own slice and the shards are assembled into
        one global array (replaces reference batches[rank::world_size],
        abs_task.py:1445); single host: plain device_put sharding."""
        if jax.process_count() > 1:
            from espnet_tpu.parallel.distributed import (
                host_local_batch_to_global,
                local_slice,
            )

            return host_local_batch_to_global(local_slice(batch), self.mesh)
        return shard_batch(batch, self.mesh)

    def train_one_epoch(self, state, iterator, epoch: int):
        sub = self.reporter.start_epoch("train", epoch)
        n_steps = 0
        n_skipped = 0
        for i, batch in enumerate(iterator):
            bsz = next(iter(batch.values())).shape[0]
            batch = self._put_batch(batch)
            with jax.set_mesh(self.mesh):  # bare-PartitionSpec constraints
                state, stats = self.train_step(state, batch)
            n_steps += 1
            n_skipped += int(float(stats.get("skipped", 0.0)) > 0.5)
            sub.register(
                {k: float(v) for k, v in stats.items()}, weight=float(bsz)
            )
            if (i + 1) % self.log_interval == 0:
                logger.info(sub.log_message(step=i + 1))
        if n_skipped:
            logger.warning(
                "epoch %d: %d/%d steps skipped (non-finite loss/grads)",
                epoch, n_skipped, n_steps,
            )
        if n_steps > 0 and n_skipped == n_steps:
            # reference aborts when every step was invalid (trainer.py:309-314)
            raise RuntimeError(
                f"epoch {epoch}: all {n_steps} steps had non-finite "
                "loss/grads — aborting training"
            )
        self.reporter.finish_epoch(sub)
        if self.tb is not None:
            for k in list(sub._sums):
                self.tb.add_scalar(f"train/{k}", sub.mean(k), epoch)
        return state

    def validate_one_epoch(self, state, iterator, epoch: int):
        sub = self.reporter.start_epoch("valid", epoch)
        eval_rng = jax.random.PRNGKey(getattr(self, "seed", 0) + 7919 * epoch)
        for i, batch in enumerate(iterator):
            bsz = next(iter(batch.values())).shape[0]
            batch = self._put_batch(batch)
            with jax.set_mesh(self.mesh):
                stats = self.eval_step(state, batch, jax.random.fold_in(eval_rng, i))
            sub.register({k: float(v) for k, v in stats.items()}, weight=float(bsz))
        self.reporter.finish_epoch(sub)
        if self.tb is not None:
            for k in list(sub._sums):
                self.tb.add_scalar(f"valid/{k}", sub.mean(k), epoch)
        logger.info(sub.log_message())

    def average_best_params(self, state, n: Optional[int] = None):
        """Average the n best epochs' params (average_nbest_models.py:15)."""
        n = n or self.keep_nbest
        best = [
            e
            for e, _ in self.reporter.sorted_epochs(
                self.best_phase, self.best_key, self.best_mode
            )[:n]
        ]
        if not best:
            return state.params
        host_params = jax.tree_util.tree_map(np.asarray, state.params)
        avg = average_nbest(self.expdir, best, host_params)
        save_checkpoint(self.expdir / f"avg_{len(best)}best.ckpt", avg)
        return avg
