"""Lane-folded HiFi-GAN inference path.

The generator's late stages run at 32/64 channels — a quarter of the TPU's
128-lane vector width — so XLA's convs leave the MXU mostly idle there
(measured: 15 TF/s at ch=32 vs ~180 TF/s at ch=256).  This module folds
time into channels (space-to-depth) for those stages: [B, T, C] is
reshaped to [B, T/F, F*C] with F = ceil(128/C), and every conv kernel is
rewritten as an equivalent block-Toeplitz kernel over the folded layout
(`fold_conv1d_weights`), so each folded conv is numerically identical to
the original while running with full lanes.  Elementwise ops (leaky_relu,
residual adds) are layout-invariant, so entire ResBlock stacks stay folded.

Weights are folded once at load from the standard generator params; outputs
match `HiFiGANGenerator.apply` bit-for-bit up to float reassociation.
"""

import numpy as np

import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


def fold_conv1d_weights(W, dilation, F):
    """[k, C, Co] conv kernel -> ([K', F*C, F*Co], pad_lo, pad_hi) over the
    folded layout.  Output phase p at block m reads input frame
    m*F + p + d*(j - (k-1)//2) = (m+q)*F + s; tap (q, s->p) carries W[j]."""
    W = np.asarray(W)
    k, C, Co = W.shape
    c = (k - 1) // 2
    q_min = (dilation * (0 - c)) // F
    q_max = (F - 1 + dilation * (k - 1 - c)) // F
    Kp = q_max - q_min + 1
    Wp = np.zeros((Kp, F * C, F * Co), W.dtype)
    for p in range(F):
        for j in range(k):
            q, s = divmod(p + dilation * (j - c), F)
            Wp[q - q_min, s * C:(s + 1) * C, p * Co:(p + 1) * Co] = W[j]
    return Wp, -q_min, q_max


def _conv(x, kernel, bias=None, pad=None, dilation=1):
    k = kernel.shape[0]
    if pad is None:
        p = dilation * (k - 1) // 2
        pad = (p, p)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1,), [pad], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


# measured v5e resblock throughput by channel count (TF/s); folded convs
# run with full lanes at ~170
_EFF_BY_CH = {32: 15.0, 64: 62.0, 128: 168.0, 256: 179.0}
_EFF_FOLDED = 170.0


def _eff(ch):
    best = 179.0
    for c, e in _EFF_BY_CH.items():
        if ch <= c:
            return e
    return best


def _fold_inflation(k, dilation, F):
    """Dense block-Toeplitz folding inflates a conv's FLOPs by K'*F/k."""
    c = (k - 1) // 2
    q_min = (dilation * (0 - c)) // F
    q_max = (F - 1 + dilation * (k - 1 - c)) // F
    return (q_max - q_min + 1) * F / k


def _stage_should_fold(ch, F, kernels, dilation_sets):
    """Whole-stage fold decision (all convs or none: mixing layouts inside
    a stage forces unfold copies of lane-padded [.., ch<128] tensors — 4x
    memory at ch=32 — which OOMs and erases the gains).

    Folded cost ~ sum(k * inflation)/eff_folded vs sum(k)/eff(ch), with a
    2.5x empirical margin on the folded side: measured on v5e, folding the
    ch=64 stage is a slight net loss despite the naive model favoring it
    (the wide K' folded convs do not reach the nominal folded TF/s), while
    ch=32 still folds decisively.
    """
    if F <= 1:
        return False
    taps = folded = 0.0
    for k, dils in zip(kernels, dilation_sets):
        for d in dils:
            taps += 2 * k
            folded += k * (_fold_inflation(k, d, F)
                           + _fold_inflation(k, 1, F))
    return 2.5 * folded / _EFF_FOLDED < taps / _eff(ch)


class FoldedHiFiGAN:
    """Inference-optimized evaluator over standard HiFiGANGenerator params.

    Folding decisions are PER CONV via the cost model above: e.g. at ch=32
    every conv folds (underfill dominates), at ch=64 only the low-dilation
    k=7/k=11 convs fold (dilated k=3 convs inflate too much).  Transitions
    between folded/unfolded layouts are plain reshapes merging adjacent
    time rows into channels — layout no-ops in row-major memory.
    """

    def __init__(self, params, config=None, min_lanes=128, fold_below=128,
                 dtype=jnp.bfloat16, resblock_backend="auto"):
        """min_lanes sets the fold factor F = ceil(min_lanes/ch);
        fold_below=0 disables folding entirely, fold_below>=1000 with the
        default cost model folds wherever profitable (tests override).
        resblock_backend: 'auto'/'fold' use the fold/XLA path (measured
        fastest); 'pallas'/'pallas_interpret' force the fused Pallas
        resblock (ops/pallas_resblock.py — measured ~2x slower than XLA
        on v5e, kept as an opt-in)."""
        config = config or {}
        self.up_rates = tuple(config.get("upsample_rates", (8, 8, 2, 2)))
        self.up_kernels = tuple(
            config.get("upsample_kernel_sizes", (16, 16, 4, 4)))
        self.init_ch = config.get("upsample_initial_channel", 512)
        self.rb_kernels = tuple(config.get("resblock_kernel_sizes",
                                           (3, 7, 11)))
        self.rb_dilations = tuple(
            tuple(d) for d in config.get("resblock_dilation_sizes",
                                         ((1, 3, 5), (1, 3, 5), (1, 3, 5))))
        self.dtype = dtype
        p = jax.device_get(params["params"] if "params" in params
                           else params)
        self.conv_pre = p["conv_pre"]
        self.conv_post = p["conv_post"]
        self.ups = [p[f"up_{i}"] for i in range(len(self.up_rates))]
        nk = len(self.rb_kernels)
        self.stages = []
        for i in range(len(self.up_rates)):
            ch = self.init_ch // (2 ** (i + 1))

            # 'auto' stays on the fold/XLA path: the fused Pallas resblock
            # measured ~2x slower than XLA's im2col convs on v5e (see
            # models/hifigan.py::resolve_resblock_backend); it remains an
            # explicit opt-in for future hardware where the trade flips
            use_pallas = resblock_backend in ("pallas", "pallas_interpret")
            if use_pallas:
                # fused Pallas resblock per MRF branch; no folding (the
                # kernel tap-packs the contraction dim instead)
                blocks = []
                for j, (k, dils) in enumerate(
                        zip(self.rb_kernels, self.rb_dilations)):
                    rb = p[f"resblock_{i * nk + j}"]
                    blocks.append((
                        jnp.stack([jnp.asarray(rb[f"conv1_{t}"]["kernel"])
                                   for t in range(len(dils))]),
                        jnp.stack([jnp.asarray(rb[f"conv1_{t}"]["bias"])
                                   for t in range(len(dils))]),
                        jnp.stack([jnp.asarray(rb[f"conv2_{t}"]["kernel"])
                                   for t in range(len(dils))]),
                        jnp.stack([jnp.asarray(rb[f"conv2_{t}"]["bias"])
                                   for t in range(len(dils))]),
                        tuple(dils),
                    ))
                self.stages.append((
                    "pallas_interpret" if resblock_backend ==
                    "pallas_interpret" else "pallas", blocks))
                continue

            F = max(1, -(-min_lanes // ch)) if ch < fold_below else 1
            if not _stage_should_fold(ch, F, self.rb_kernels,
                                      self.rb_dilations):
                F = 1

            def build_conv(w, b, d):
                if F > 1:
                    wf, lo, hi = fold_conv1d_weights(w, d, F)
                    return (jnp.asarray(wf), (lo, hi),
                            jnp.asarray(np.tile(np.asarray(b), F)), 1, True)
                return (jnp.asarray(np.asarray(w)), None, jnp.asarray(b),
                        d, False)

            blocks = []
            for j, (k, dils) in enumerate(
                    zip(self.rb_kernels, self.rb_dilations)):
                rb = p[f"resblock_{i * nk + j}"]
                taps = []
                for t, d in enumerate(dils):
                    taps.append((
                        build_conv(rb[f"conv1_{t}"]["kernel"],
                                   rb[f"conv1_{t}"]["bias"], d),
                        build_conv(rb[f"conv2_{t}"]["kernel"],
                                   rb[f"conv2_{t}"]["bias"], 1),
                    ))
                blocks.append(taps)
            self.stages.append((F, blocks))

    def __call__(self, mel):
        """mel [B, T, n_mels] -> wav [B, T * prod(rates)]."""
        x = mel.astype(self.dtype)
        x = _conv(x, jnp.asarray(self.conv_pre["kernel"]),
                  jnp.asarray(self.conv_pre["bias"]), pad=(3, 3))
        for i, (u, k) in enumerate(zip(self.up_rates, self.up_kernels)):
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            up = self.ups[i]
            x = jax.lax.conv_transpose(
                x, jnp.asarray(up["kernel"]).astype(x.dtype), (u,), "VALID",
                dimension_numbers=("NWC", "WIO", "NWC"))
            x = x + jnp.asarray(up["bias"]).astype(x.dtype)
            crop = (k - u) // 2
            if crop:
                x = x[:, crop:-crop, :]
            F, blocks = self.stages[i]
            b, t, c = x.shape
            if F in ("pallas", "pallas_interpret"):
                from fastspeech2_tpu.ops.pallas_resblock import (
                    fused_resblock,
                )

                acc = None
                for w1s, b1s, w2s, b2s, dils in blocks:
                    y = fused_resblock(x, w1s, b1s, w2s, b2s, dils,
                                       F == "pallas_interpret")
                    acc = y if acc is None else acc + y
                x = acc / len(blocks)
                continue
            if F > 1:
                # enter folded layout once for the whole stage; every conv
                # in it carries folded weights
                x = x.reshape(b, t // F, F * c)

            def apply_conv(v, spec):
                w, pad, bias, d, _ = spec
                return _conv(v, w, bias,
                             pad=pad if pad is None else tuple(pad),
                             dilation=d)

            acc = None
            for taps in blocks:
                y = x
                for conv1_spec, conv2_spec in taps:
                    xt = jax.nn.leaky_relu(y, LRELU_SLOPE)
                    xt = apply_conv(xt, conv1_spec)
                    xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                    xt = apply_conv(xt, conv2_spec)
                    y = y + xt
                acc = y if acc is None else acc + y
            x = acc / len(blocks)
            if F > 1:
                x = x.reshape(b, t, c)
        x = jax.nn.leaky_relu(x, 0.01)
        x = _conv(x, jnp.asarray(self.conv_post["kernel"]),
                  jnp.asarray(self.conv_post["bias"]), pad=(3, 3))
        return jnp.tanh(x)[..., 0]
