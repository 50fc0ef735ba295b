"""Fast repro for the [SPMD] involuntary-remat warnings: just CostRegNet
under the ('data','space') mesh on the 8-device CPU mesh, with a grad.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/repro_slab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from damvsnet_tpu.nn.costreg import CostRegNet
from damvsnet_tpu.parallel import make_mesh


def main():
    mesh = make_mesh(data=4, space=2)
    reg = CostRegNet(base_channels=8, slab_axis="space")
    rs = np.random.default_rng(0)
    x = jnp.asarray(rs.random((4, 8, 8, 8, 32), np.float32))
    with mesh:
        v = reg.init(jax.random.PRNGKey(0), x, False)
        v = jax.device_put(v, NamedSharding(mesh, P()))  # replicated params
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))

        def loss(v, x):
            out, _ = reg.apply(v, x, True, mutable=["batch_stats"])
            return jnp.mean(out ** 2)

        g = jax.jit(jax.grad(loss))(v, xs)
        jax.block_until_ready(g)
    print("repro done")


if __name__ == "__main__":
    main()
