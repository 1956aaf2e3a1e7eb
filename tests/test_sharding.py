"""Mesh/sharding unit tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gaze_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch


class TestMesh:
    def test_eight_virtual_devices(self):
        assert jax.device_count() == 8

    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.size == 8
        assert mesh.axis_names == ("data",)

    def test_make_mesh_subset(self):
        mesh = make_mesh(4)
        assert mesh.size == 4

    def test_shard_batch_places_shards(self):
        mesh = make_mesh()
        batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
        sharded = shard_batch(mesh, batch)
        x = sharded["x"]
        assert x.sharding.spec == P("data")
        # Each device holds 16/8 = 2 rows.
        assert x.addressable_shards[0].data.shape == (2, 2)
        np.testing.assert_array_equal(np.asarray(x), batch["x"])

    def test_replicated_spec(self):
        mesh = make_mesh()
        sh = replicated(mesh)
        assert sh.spec == P()

    def test_dp_sum_uses_all_shards(self):
        """A jitted reduction over a batch-sharded input must equal the
        full-batch reduction (XLA inserts the cross-device collective)."""
        mesh = make_mesh()
        x = np.arange(64, dtype=np.float32).reshape(16, 4)
        xs = jax.device_put(x, batch_sharding(mesh))
        out = jax.jit(lambda a: jnp.sum(a), out_shardings=replicated(mesh))(xs)
        np.testing.assert_allclose(float(out), x.sum())
