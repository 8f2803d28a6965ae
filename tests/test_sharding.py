"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from rfs_slam_tpu.parallel import mesh as mesh_lib


def cpu_devices(n):
    d = jax.devices("cpu")
    assert len(d) >= n
    return d[:n]


def test_mesh_and_shardings():
    import __graft_entry__ as g

    devs = cpu_devices(4)
    mesh = mesh_lib.make_mesh(4, devices=devs)
    filt = g._build(n_particles=8, map_capacity=16, z_capacity=4,
                    new_capacity=8, eval_capacity=4, z_dp_max=4)
    with jax.default_device(devs[0]):
        state, _, _, _ = g._example_inputs(filt, jax.random.PRNGKey(0))
    shardings = mesh_lib.state_shardings(state, mesh, 8)
    # particle-axis arrays shard, scalars/z replicate
    assert shardings.gm.mean.spec == jax.sharding.PartitionSpec(None, "particles")
    assert shardings.last_z.spec == jax.sharding.PartitionSpec()
    assert shardings.n_updates.spec == jax.sharding.PartitionSpec()


def test_sharded_step_matches_single_device():
    """The full filter step must be invariant to particle-axis sharding.

    This is the determinism test replacing the reference's (absent) race
    detection: same seed => identical outputs across shardings
    (SURVEY.md section 5).
    """
    import __graft_entry__ as g

    filt = g._build(n_particles=8, map_capacity=16, z_capacity=4,
                    new_capacity=8, eval_capacity=4, z_dp_max=4)
    devs = cpu_devices(4)
    with jax.default_device(devs[0]):
        state, odo, z, zm = g._example_inputs(filt, jax.random.PRNGKey(0))

        def step(s, o, zz, zzm):
            s = filt.predict(s, o, 0.1)
            return filt.update(s, zz, zzm)

        ref = jax.jit(step)(state, odo, z, zm)
        ref = jax.tree_util.tree_map(np.asarray, ref)

        mesh = mesh_lib.make_mesh(4, devices=devs)
        shardings = mesh_lib.state_shardings(state, mesh, 8)
        repl = mesh_lib.replicated(mesh)
        s_sh = jax.tree_util.tree_map(jax.device_put, state, shardings)
        sharded = jax.jit(
            step, in_shardings=(shardings, repl, repl, repl),
            out_shardings=shardings,
        )(s_sh, *jax.device_put((odo, z, zm), repl))
        sharded = jax.tree_util.tree_map(np.asarray, sharded)

    np.testing.assert_allclose(
        ref.particles.pose, sharded.particles.pose, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        ref.particles.log_w, sharded.particles.log_w, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(ref.gm.alive, sharded.gm.alive)
    np.testing.assert_allclose(ref.gm.w, sharded.gm.w, rtol=1e-4, atol=1e-5)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
