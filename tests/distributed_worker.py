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
    print(f"rank{opt.process_id} OK mean={got}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
