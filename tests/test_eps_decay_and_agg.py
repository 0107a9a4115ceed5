"""Adadelta eps-decay hook + aggregate_stats_dirs CLI."""
import numpy as np


def test_adadelta_optimizer_builds_and_steps():
    import jax
    import jax.numpy as jnp
    import optax

    from espnet_tpu.train.optimizers import build_optimizer

    tx = build_optimizer("adadelta", lr=1.0, grad_clip=5.0)
    params = {"w": jnp.ones((3,))}
    opt_state = tx.init(params)
    g = {"w": jnp.ones((3,)) * 0.1}
    updates, opt_state = tx.update(g, opt_state, params)
    params = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(params["w"])).all()
    # eps hyperparam is reachable for the decay hook
    found = []

    def visit(os):
        if hasattr(os, "hyperparams") and "eps" in os.hyperparams:
            found.append(os)
        elif isinstance(os, tuple):
            for o in os:
                visit(o)

    visit(opt_state)
    assert found, "inject_hyperparams eps not found in opt state"
    before = float(found[0].hyperparams["eps"])
    found[0].hyperparams["eps"] = found[0].hyperparams["eps"] * 0.1
    updates, opt_state2 = tx.update(g, opt_state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_aggregate_stats_dirs(tmp_path):
    from espnet_tpu.bin import aggregate_stats_dirs

    for i in range(2):
        d = tmp_path / f"shard{i}"
        d.mkdir()
        np.savez(
            d / "feats_stats.npz",
            count=10.0 * (i + 1),
            sum=np.full(4, float(i + 1)),
            sum_square=np.full(4, float(i + 2)),
        )
        (d / "speech_shape").write_text(f"utt{i} 5,4\n")
    aggregate_stats_dirs.main(
        ["--input_dirs", str(tmp_path / "shard0"), str(tmp_path / "shard1"),
         "--output_dir", str(tmp_path / "agg")]
    )
    st = np.load(tmp_path / "agg" / "feats_stats.npz")
    assert float(st["count"]) == 30.0
    np.testing.assert_allclose(st["sum"], np.full(4, 3.0))
    lines = (tmp_path / "agg" / "speech_shape").read_text().splitlines()
    assert len(lines) == 2
