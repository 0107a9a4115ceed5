"""Worker for the 2-process jax.distributed test (reference analog:
test/espnet2/train/test_distributed_utils.py:192-227 spawns 2 workers
with gloo + free_port).

Each process: resolve DistributedOption from env (SLURM-style), init
jax.distributed, build the global mesh, feed its LOCAL batch slice
through host_local_batch_to_global, and jit a mean over the data axis.
The result must equal the full-batch numpy mean on every process.
"""
import os
import sys

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from espnet_tpu.parallel.distributed import (
        DistributedOption,
        host_local_batch_to_global,
        local_slice,
    )
    from espnet_tpu.parallel.mesh import make_mesh

    opt = DistributedOption(distributed=True).resolve()
    assert opt.num_processes == 2, opt
    assert opt.coordinator_address, opt
    opt.init()
    assert jax.process_count() == 2, jax.process_count()

    mesh = make_mesh(axis_names=("data", "model"))
    # host-identical global batch; each process contributes its slice
    full = np.arange(8 * 3, dtype=np.float32).reshape(8, 3) + 1.0
    local = local_slice({"x": full}, axis_size=2, rank=opt.process_id)["x"]
    assert local.shape[0] == 4
    global_batch = host_local_batch_to_global({"x": local}, mesh)

    @jax.jit
    def mean(b):
        return b["x"].mean()

    got = float(mean(global_batch))
    want = float(full.mean())
    assert abs(got - want) < 1e-6, (got, want)

    # Multi-host-safe checkpoint round-trip (reference resume semantics
    # abs_task.py:886-914 under sharding): a data-axis-sharded global
    # array spans both processes → not fully addressable → np.asarray
    # raises → save_checkpoint must take the per-process-shards path,
    # and load_checkpoint must reassemble the global value bit-exact.
    ckpt_dir = os.environ.get("CKPT_DIR")
    if ckpt_dir:
        import time

        from jax.sharding import NamedSharding, PartitionSpec as P

        from espnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint

        wfull = np.arange(8 * 6, dtype=np.float32).reshape(8, 6) * 0.25
        sharding = NamedSharding(mesh, P("data", None))
        warr = jax.make_array_from_callback(
            wfull.shape, sharding, lambda idx: wfull[idx]
        )
        assert not warr.is_fully_addressable
        state = {"w": warr, "step": np.int32(7)}
        path = os.path.join(ckpt_dir, "state.ckpt")
        save_checkpoint(path, state)
        # shared-filesystem barrier: wait for the peer's shard file
        # (gloo collectives are flaky under CPU contention in CI)
        deadline = time.time() + 120
        shard_dir = path + ".shards"
        while len(os.listdir(shard_dir)) < 2:
            if time.time() > deadline:
                raise TimeoutError(f"peer shard never appeared in {shard_dir}")
            time.sleep(0.2)
        time.sleep(0.5)  # let the peer finish its write
        restored = load_checkpoint(
            path, {"w": np.zeros_like(wfull), "step": np.int32(0)}
        )
        np.testing.assert_array_equal(restored["w"], wfull)
        assert int(restored["step"]) == 7
        # resume: re-shard and check every local shard matches its slice
        re_sharded = jax.device_put(restored["w"], sharding)
        for s in re_sharded.addressable_shards:
            np.testing.assert_array_equal(np.asarray(s.data), wfull[s.index])
        print(f"rank{opt.process_id} CKPT_OK", flush=True)

    print(f"rank{opt.process_id} OK mean={got}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
