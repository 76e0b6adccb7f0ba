"""The shared tunnel-proof measurement primitives (videoyolo_tpu/profiling)
— the single implementation bench.py and tools/prof_latency.py import
(ADVICE r3: the two copies had started to drift).
"""
import jax
import jax.numpy as jnp
import numpy as np

from videoyolo_tpu.models.yolo3 import YOLOv3
from videoyolo_tpu.profiling import build_latency_chain, chain_ms, force

S = 64


def test_latency_chain_compiles_and_preserves_input_value():
    """The chain's carry term is zero-valued BY CONSTRUCTION (sc.sum()*0):
    the output must equal the input exactly, else the chained steps would
    not be measuring the production forward."""
    model = YOLOv3(num_classes=3)
    x = jnp.asarray(np.random.RandomState(0).rand(1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    chain = build_latency_chain(model, variables, iters=3)
    out = chain(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=0, atol=0)


def test_chain_ms_returns_per_step_time():
    model = YOLOv3(num_classes=3)
    x = jnp.asarray(np.random.RandomState(1).rand(1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    chain = build_latency_chain(model, variables, iters=2)
    ms = chain_ms(chain, x, iters=2, nruns=3)
    assert ms > 0


def test_force_is_a_barrier_on_trees():
    force({"a": jnp.arange(4.0), "b": (jnp.zeros((2, 2)),)})  # no raise
