"""Component-level serve-step profile: is a Pallas conv block warranted?

SURVEY.md C14 leaves the depthwise-separable backbone on XLA's
``conv_general_dilated`` (feature_group_count) and says a Pallas fused
conv+BN+act block should ship only "if profiling warrants". This script is
that profile: it times each serve-step component in isolation on the chip
(same in-jit K-loop methodology as run_all.py) and compares the conv
backbone's measured time against its bf16 roofline, so the ship/skip
decision is recorded with numbers instead of vibes.

Components (B=256, W=128 bucket, bfloat16 — the headline serving config):
  * preprocess  : fused resize/pad/normalize (ops/preprocess.py)
  * conv        : stem + 4 depthwise-separable blocks + height collapse
  * head        : time_dense + 2x BiRNN + BN + logits (Pallas GRU cell)
  * decode      : softmax + greedy CTC decode
  * full        : the whole serve step (cross-check: parts should ~sum)

Run: python benchmarks/profile_backbone.py   (on the TPU env)
Writes benchmarks/profile_backbone.json and prints a verdict line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_all import _device_time  # noqa: E402  (shared timing harness)


def conv_flops(B, H, W, cfg):
    """MACs*2 for stem + blocks (conv only; BN/relu/pool are ~free)."""
    total = 0
    h, w, cin = H, W, 1
    # stem 3x3 -> stem_filters, then 2x2 pool
    total += 2 * B * h * w * 9 * cin * cfg.stem_filters
    h, w, cin = h // 2, w // 2, cfg.stem_filters
    for filters, (ph, pw) in zip(cfg.block_filters, cfg.block_pools):
        total += 2 * B * h * w * 9 * cin          # depthwise 3x3
        total += 2 * B * h * w * cin * filters    # pointwise 1x1
        h, w, cin = h // ph, w // pw, filters
    return total


def head_flops(B, T, feat, cfg):
    total = 2 * B * T * feat * cfg.time_dense_size
    d = cfg.time_dense_size
    ngates = 3 if cfg.rnn_cell == "gru" else 4
    for _ in range(cfg.rnn_layers):
        # per direction: input proj + recurrent matmul, ngates * units wide
        total += 2 * 2 * B * T * (d + cfg.n_units) * ngates * cfg.n_units
        d = 2 * cfg.n_units
    total += 2 * B * T * d * (cfg.num_classes + 1)
    return total


def main() -> int:
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from crnn_ocr_tpu.models import CRNN, ModelConfig
    from crnn_ocr_tpu.models.crnn import DepthwiseSeparableBlock
    from crnn_ocr_tpu.models.rnn import BiRNN
    from crnn_ocr_tpu.ops import ctc
    from crnn_ocr_tpu.ops.preprocess import preprocess_batch

    B, W, K = 256, 128, 32
    cfg = ModelConfig(
        num_classes=80, width=W, dtype="bfloat16", use_pallas_rnn=True
    )
    rng = np.random.default_rng(0)
    results = {"device": str(jax.devices()[0]), "batch": B, "width": W,
               "parts_ms": {}, "flops": {}}

    class ConvOnly(nn.Module):
        cfg: ModelConfig

        @nn.compact
        def __call__(self, x):
            c = self.cfg
            x = x.astype(jnp.bfloat16)
            x = nn.Conv(c.stem_filters, (3, 3), padding="SAME",
                        use_bias=False, dtype=jnp.bfloat16,
                        name="stem_conv")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=jnp.bfloat16,
                             epsilon=1e-3, momentum=0.99, name="stem_bn")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for i, (filters, pool) in enumerate(
                zip(c.block_filters, c.block_pools)
            ):
                x = DepthwiseSeparableBlock(
                    filters=filters, pool=tuple(pool), dropout_rate=0.0,
                    dtype=jnp.bfloat16, name=f"block{i}",
                )(x, train=False)
            Bx, Hp, T, Cc = x.shape
            return jnp.transpose(x, (0, 2, 1, 3)).reshape(Bx, T, Hp * Cc)

    class HeadOnly(nn.Module):
        cfg: ModelConfig

        @nn.compact
        def __call__(self, x):
            c = self.cfg
            x = x.astype(jnp.bfloat16)
            x = nn.Dense(c.time_dense_size, dtype=jnp.bfloat16,
                         name="time_dense")(x)
            x = nn.relu(x)
            for i in range(c.rnn_layers):
                x = BiRNN(units=c.n_units, cell=c.rnn_cell,
                          dtype=jnp.bfloat16, use_pallas=c.use_pallas_rnn,
                          name=f"birnn{i}")(x)
                x = nn.BatchNorm(use_running_average=True,
                                 dtype=jnp.bfloat16, epsilon=1e-3,
                                 momentum=0.99, name=f"rnn_bn{i}")(x)
            return nn.Dense(c.logits_dim, dtype=jnp.float32,
                            name="logits")(x)

    T = cfg.time_steps()  # 32
    feat = 512  # Hp(=1) * last block filters
    Td = T - cfg.ctc_time_slice

    # --- inputs (K distinct copies for the scanned timing loop) ---
    raw = rng.integers(0, 255, size=(K, B, 48, W + 64)).astype(np.uint8)
    hs = np.full((K, B), 48, np.int32)
    ws = rng.integers(W // 2, W + 64, size=(K, B)).astype(np.int32)
    ximg = jnp.asarray(rng.normal(size=(K, B, cfg.height, W, 1)),
                       jnp.float32)
    xseq = jnp.asarray(rng.normal(size=(K, B, T, feat)), jnp.float32)
    probs = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(K, B, Td, cfg.logits_dim)),
                    jnp.float32), axis=-1)
    il = jnp.full((K, B), Td, jnp.int32)

    conv = ConvOnly(cfg=cfg)
    vconv = conv.init(jax.random.key(0), ximg[0])
    head = HeadOnly(cfg=cfg)
    vhead = head.init(jax.random.key(0), xseq[0])
    full = CRNN(cfg=cfg)
    vfull = full.init({"params": jax.random.key(0)}, ximg[0], train=False)

    def t(name, fn, const, varying, flops=None):
        s = _device_time(fn, const, varying, K=K)
        results["parts_ms"][name] = round(1e3 * s, 3)
        if flops is not None:
            results["flops"][name] = flops
        print(f"{name:<11} {1e3 * s:8.3f} ms"
              + (f"   {flops / s / 1e12:6.1f} TF/s eff" if flops else ""),
              file=sys.stderr)
        return s

    t("preprocess", lambda r, h, w: preprocess_batch(
        r, h, w, out_h=cfg.height, out_w=W)[0], (),
      tuple(map(jax.device_put, (raw, hs, ws))))
    t("conv", lambda v, x: conv.apply(v, x), (vconv,), (ximg,),
      flops=conv_flops(B, cfg.height, W, cfg))
    t("head", lambda v, x: head.apply(v, x), (vhead,), (xseq,),
      flops=head_flops(B, T, feat, cfg))
    t("decode", lambda p, l: ctc.ctc_greedy_decode(p, l), (), (probs, il))
    t("full", lambda v, x: full.apply(v, x, train=False),
      (vfull,), (ximg,))

    p = results["parts_ms"]
    conv_frac = p["conv"] / max(p["full"], 1e-9)
    # v5e bf16 peak ~197 TF/s; roofline fraction for the conv stage
    eff = results["flops"]["conv"] / (p["conv"] / 1e3) / 1e12
    results["conv_fraction_of_model"] = round(conv_frac, 3)
    results["conv_eff_tflops"] = round(eff, 1)
    # The FLOPs-roofline heuristic here once said "ship pallas conv"; the
    # per-op trace (trace_serve.py) showed the stages are BANDWIDTH-bound
    # with BN+relu+pool already fused by XLA into one reduce-window op,
    # and a fused Pallas backbone measured 2-5x SLOWER (layout padding).
    # See DESIGN.md "SURVEY C14 decision". Effective-TFLOPs is the wrong
    # lens for a memory-bound stage; keep the numbers, drop the verdict.
    results["verdict"] = (
        "xla conv at parity (trace evidence: DESIGN.md C14 decision)"
    )
    out = os.path.join(os.path.dirname(__file__), "profile_backbone.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
