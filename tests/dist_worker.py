"""Worker for the 2-process jax.distributed localhost smoke test
(tests/test_shard_map.py). Each process owns 4 virtual CPU devices; the
global mesh spans 8. Exercises:

- jax.distributed.initialize over a localhost coordinator
- mesh.host_local_slice to pick this process's env shard
- jax.make_array_from_process_local_data to assemble the global batch
- a jitted global computation whose reduction crosses processes
"""
import sys

import numpy as np


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from marlgrid_tpu.core import grid_gen, step as step_mod
    from marlgrid_tpu.core.state import EnvParams, default_agent_colors
    from marlgrid_tpu.parallel.mesh import host_local_slice, make_mesh

    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc, jax.device_count()

    mesh = make_mesh(n_model=1)            # ('data', 'model') global mesh
    B = 16                                 # global env batch
    sl = host_local_slice(mesh, B)
    assert (sl.stop - sl.start) == B // nproc

    params = EnvParams(width=9, height=9, n_agents=2, scenario="empty",
                       max_steps=8, view_size=5, observation_style="encode",
                       agent_colors=default_agent_colors(2))
    # host-local env shard -> one global sharded array per state leaf
    keys = jax.random.split(jax.random.PRNGKey(0), B)[sl]
    with jax.default_device(jax.local_devices()[0]):
        local_state = jax.jit(
            jax.vmap(lambda k: grid_gen.reset(params, k)))(keys)
    sharding = NamedSharding(mesh, P("data"))
    gstate = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), local_state)

    @jax.jit
    def global_step_sum(state):
        state, rew, done = jax.vmap(
            lambda s: step_mod.step(params, s,
                                    jnp.full((2,), 2, jnp.int32)))(state)
        # cross-process reduction (gradient-allreduce stand-in)
        return state, rew.sum(), done.sum()

    gstate, rsum, dsum = global_step_sum(gstate)
    total = float(jax.device_get(rsum))
    assert np.isfinite(total)
    pos = jax.device_get(
        jax.tree.map(lambda x: x, gstate.agent_pos.addressable_shards[0].data))
    assert pos.shape[-1] == 2
    print(f"DIST-OK process={pid} devices={jax.device_count()} "
          f"slice={sl.start}:{sl.stop} rew_sum={total}")


if __name__ == "__main__":
    main()
