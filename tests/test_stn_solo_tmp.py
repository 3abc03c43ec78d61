import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax, jax.numpy as jnp, numpy as np

def test_stn_identity_at_init():
    from crnn_ocr_tpu.models.stn import STN
    model = STN()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 64, 1)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    err = float(jnp.max(jnp.abs(np.asarray(y) - np.asarray(x))))
    print("ERR:", err)
    assert err < 1e-4
