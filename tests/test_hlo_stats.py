"""utils/hlo_stats: collective-volume accounting from compiled HLO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ihgnn_tpu.utils.hlo_stats import collective_stats, comm_bytes


def test_parse_synthetic_lines():
    txt = """
  ar = f32[32,1024]{1,0} all-reduce(f32[32,1024]{1,0} x), replica_groups={}
  ag.1 = bf16[64,512]{1,0} all-gather-start(bf16[64,128]{1,0} y), dim=1
  done = bf16[64,512]{1,0} all-gather-done(ag.1)
  rs = (f32[16]{0}, f32[16]{0}) reduce-scatter(a, b), dimensions={0}
  notacoll = f32[8]{0} add(f32[8]{0} p, f32[8]{0} q)
"""
    stats = collective_stats(txt)
    assert stats["all-reduce"] == {"count": 1, "bytes": 32 * 1024 * 4}
    assert stats["all-gather"] == {"count": 1, "bytes": 64 * 512 * 2}
    assert stats["reduce-scatter"] == {"count": 1, "bytes": 2 * 16 * 4}
    assert "add" not in stats
    assert comm_bytes(txt) == (32 * 1024 * 4 + 64 * 512 * 2 + 128)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_compiled_psum_counted():
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("d",))

    def f(x):
        return jax.shard_map(lambda v: jax.lax.psum(v, "d"), mesh=mesh,
                             in_specs=P("d"), out_specs=P())(x)

    x = jnp.zeros((8, 128), jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh, P("d")))
    hlo = jax.jit(f).lower(x).compile().as_text()
    stats = collective_stats(hlo)
    assert stats.get("all-reduce", {}).get("count", 0) >= 1
    assert comm_bytes(hlo) > 0
