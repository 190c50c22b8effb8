"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): FA2-forward attention TFLOP/s per chip
WITH FP8 KV at the reference config "16 heads, seq=16k, d=128" (the north
star is "≥70% of per-chip speed-of-light with FP8 KV"). vs_baseline is
the fraction of that target (0.70 × the chip's bf16 MXU peak):
vs_baseline >= 1.0 means the target is met. Supplementary numbers (bf16 /
int8 forwards, causal, fwd+bwd, GQA + quantized decode tokens/s vs
context, train step) ride in "extra".

Timing uses scan-chaining inside one jit (utils/timing.time_scanned)
because the tunnelled TPU backend acks dispatches early and has a
per-dispatch floor; the floor VARIES day to day (~1 ms on the round-4
bench day, ~7 ms a day later), so time_scanned measures two scan
lengths and takes the slope — the floor cancels whatever it is.

FAIL-SOFT STRUCTURE (lesson of BENCH_r03: a single HBM OOM in the
LAST section threw away every already-measured number): results are
collected incrementally, every section runs under try/except, section
progress goes to stderr so a crash is localizable from the driver's
tail, and the JSON line is printed no matter which sections died
(failed sections appear under extra.errors). Section order puts the
fixed-footprint train step early in a clean heap and the multi-GB transient
decode caches last.
"""

from __future__ import annotations

import functools
import gc
import json
import sys
import traceback

import jax
import jax.numpy as jnp

from cuda_flashattention_tpu.ops.attention import flash_attention
from cuda_flashattention_tpu.ops.decode import decode_attention
from cuda_flashattention_tpu.ops.flash_fwd import flash_attention_forward
from cuda_flashattention_tpu.ops.quant import quantize_kv
from cuda_flashattention_tpu.utils.timing import (
    attention_flops,
    device_peaks,
    time_scanned,
)

B, H, N, D = 1, 16, 16384, 128
SOL_FRACTION_TARGET = 0.70


def _gate_device() -> bool:
    """Bounded device-liveness gate before the first dispatch.

    A tunnelled TPU can be unreachable for hours (docs/MEMO.md #23) and
    the first dispatch would hang this process forever — wait boundedly
    and fail loudly so the driver records a clean error. The platform is
    read WITHOUT jax.default_backend(): creating the PJRT client itself
    hangs on a dead tunnel (measured >400 s during the outage this gate
    exists for)."""
    from cuda_flashattention_tpu import config as _config
    wait_s = _config.BENCH_WAIT_DEVICE_S.as_int
    import os as _os
    plat = str(jax.config.jax_platforms
               or _os.environ.get("JAX_PLATFORMS", ""))
    # primary platform only: "axon,cpu" means axon with cpu FALLBACK —
    # the fallback never engages for a dead tunnel (the plugin
    # initialises fine; it's the dispatch that hangs), so it must gate
    if wait_s > 0 and plat.split(",")[0].strip() != "cpu":
        import importlib.util as _ilu
        spec = _ilu.spec_from_file_location(
            "wait_device", _os.path.join(
                _os.path.dirname(_os.path.abspath(__file__)),
                "scripts", "wait_device.py"))
        wd = _ilu.module_from_spec(spec)
        spec.loader.exec_module(wd)
        if not wd.wait_device(max_wait_s=wait_s, probe_timeout_s=120.0,
                              interval_s=240.0):
            print(f"bench.py: device answered no dispatch within "
                  f"{wait_s}s (tunnel down? MEMO #23) — aborting",
                  file=sys.stderr)
            return False
    return True


class Bench:
    """Incremental result collection with fail-soft sections."""

    def __init__(self):
        self.extra: dict = {}
        self.errors: dict = {}
        self._keys = iter(jax.random.split(jax.random.PRNGKey(0), 64))

    def mk(self, shape, dtype=jnp.bfloat16):
        # generate on-device: host numpy at these sizes (GBs) is slow
        return jax.random.uniform(next(self._keys), shape, dtype,
                                  -0.5, 0.5)

    def section(self, name: str, fn) -> bool:
        """Run one bench section; on failure record the error and free
        what we can so later sections still get a clean-ish heap."""
        print(f"bench.py: section [{name}] ...", file=sys.stderr,
              flush=True)
        try:
            fn()
            return True
        except Exception as e:  # noqa: BLE001 — fail-soft by design
            tb = traceback.format_exc(limit=8)
            print(f"bench.py: section [{name}] FAILED: {e}\n{tb}",
                  file=sys.stderr, flush=True)
            self.errors[name] = f"{type(e).__name__}: {e}"
            gc.collect()
            try:
                jax.clear_caches()
            except Exception:
                pass
            return False


def main() -> None:
    if not _gate_device():
        sys.exit(1)

    bench = Bench()
    mk = bench.mk
    extra = bench.extra
    decode: dict = {}

    fl = attention_flops(B, H, N, N, D)
    fl_c = attention_flops(B, H, N, N, D, causal=True)

    # live across the forward sections; freed before the decode ones
    live: dict = {}

    # Every attention row is SCAN-CHAINED (utils/timing.time_scanned):
    # the tunnelled backend has a per-dispatch floor that plain
    # chaining cannot amortise — it shaved even 10 ms forward steps by
    # ~10% (causal 110.5 plain vs 122.4 scanned, measured back-to-back)
    # and swamped sub-ms decode steps entirely. The floor varies by day
    # (~1 ms → ~7 ms observed), so time_scanned now differences two
    # scan lengths — the floor cancels exactly. Scanning the op inside
    # one jit is also how the op runs in practice (inside jitted train
    # steps / generation loops). VERDICT r2 #6 "make the bench
    # trustworthy".
    def fwd_row(flops, *args, inner=8, iters=4, **kw):
        t = time_scanned(
            lambda x, *a: flash_attention_forward(x, *a, **kw)[0],
            live["q"], *args, inner=inner, iters=iters)
        return flops / t / 1e12

    # --- headline: FA2 forward with FP8 KV (north star), plus bf16 /
    # int8 / causal variants for context ---
    def sec_forward():
        q = mk((B, H, N, D))
        live["q"], live["k"], live["v"] = q, mk((B, H, N, D)), mk(
            (B, H, N, D))
        k, v = live["k"], live["v"]
        kv_fp8 = quantize_kv(k, v, "fp8")
        fp8_args = (kv_fp8.k_q, kv_fp8.v_q)
        fp8_kw = dict(k_scale=kv_fp8.k_scale, v_scale=kv_fp8.v_scale)
        extra["_fp8_qq"] = fwd_row(fl, *fp8_args, quantize_q=True,
                                   **fp8_kw)
        extra["fp8_fwd_dequant_only_tflops"] = fwd_row(fl, *fp8_args,
                                                       **fp8_kw)
        kv_i8 = quantize_kv(k, v, "int8")
        i8_kw = dict(k_scale=kv_i8.k_scale, v_scale=kv_i8.v_scale)
        extra["int8_fwd_tflops"] = fwd_row(fl, kv_i8.k_q, kv_i8.v_q,
                                           **i8_kw)
        # int8 KV + per-head int8 Q: QK^T on the MXU's 2x int8 path
        extra["int8_fwd_quantize_q_tflops"] = fwd_row(
            fl, kv_i8.k_q, kv_i8.v_q, quantize_q=True, **i8_kw)
        del kv_i8
        extra["bf16_fwd_tflops"] = fwd_row(fl, k, v)
        extra["causal_fwd_tflops"] = fwd_row(fl_c, k, v, causal=True)
        extra["causal_fwd_fp8_qq_tflops"] = fwd_row(
            fl_c, *fp8_args, causal=True, quantize_q=True, **fp8_kw)
        # sliding-window prefill (the windowed-serving prefill shape;
        # windowed decode rows live in sec_decode_windowed) — flops
        # count only the visible band: rows 0..W-1 see i+1 keys
        # (W(W+1)/2 pairs), the rest see exactly W ((N-W)·W pairs)
        win = 4096
        pairs_w = B * H * (win * (win + 1) / 2 + (N - win) * win)
        fl_w = 2.0 * pairs_w * D * 2  # 2 matmuls x 2·d MACs per pair
        extra["causal_win4096_fwd_tflops"] = fwd_row(
            fl_w, k, v, causal=True, window=win)

    bench.section("forward_16k", sec_forward)

    # --- long-seq causal prefill (N=65536): past ~24k rows at d=128 the
    # K-major kernel's full-sequence VMEM state exceeds its budget and
    # the host falls back to the Q-major band grid — this row watches
    # that cliff (VERDICT r2 #6). B*H shrinks to keep HBM/time sane.
    def sec_prefill_65k():
        n_long = 65536
        ql = mk((1, 4, n_long, D))
        kl, vl = mk((1, 4, n_long, D)), mk((1, 4, n_long, D))
        t_cl = time_scanned(
            lambda x, k_, v_: flash_attention_forward(
                x, k_, v_, causal=True)[0],
            ql, kl, vl, inner=4, iters=3)
        extra["causal_fwd_65k_tflops"] = (
            attention_flops(1, 4, n_long, n_long, D, causal=True)
            / t_cl / 1e12)

    bench.section("prefill_65k", sec_prefill_65k)

    # --- forward+backward (training shape; combined grads feed next q).
    # ALL of dQ/dK/dV must be consumed: with argnums=0 XLA dead-codes
    # the split path's entire dKdV kernel (its outputs are unused), so
    # r2/r3 recorded a dQ-only time as "fwd+bwd" — inflated ~30%. ---
    def sec_fwd_bwd():
        # section isolation: survive a sec_forward crash, including one
        # mid-population (q set, k/v not) — guard on completeness.
        if any(key not in live for key in ("q", "k", "v")):
            live.clear()
            live["q"], live["k"], live["v"] = (
                mk((B, H, N, D)) for _ in range(3))
        q, k, v = live["q"], live["k"], live["v"]
        do = mk((B, H, N, D))
        grad_fn = jax.grad(
            lambda q, k, v, do: jnp.sum(
                flash_attention(q, k, v, causal=True).astype(jnp.float32)
                * do.astype(jnp.float32)), argnums=(0, 1, 2))
        def fb_step(x, k_, v_, do_):
            dq, dk, dv = grad_fn(x, k_, v_, do_)
            return jnp.tanh(dq + dk + dv)
        t_fb = time_scanned(fb_step, q, k, v, do, inner=4, iters=4)
        extra["fwd_bwd_tflops"] = (
            attention_flops(B, H, N, N, D, causal=True)
            + attention_flops(B, H, N, N, D, causal=True,
                              backward=True)) / t_fb / 1e12

    bench.section("fwd_bwd", sec_fwd_bwd)
    live.clear()
    gc.collect()

    # --- flagship model train step (single chip): tokens/s + MFU ---
    # Runs BEFORE the decode sections: its 1.6 GB fp32→bf16 init is the
    # allocation that OOMed in round 3 after the 1M-cache churn — give
    # it a clean heap instead.
    def sec_train():
        import optax
        from cuda_flashattention_tpu.models.transformer import (
            TransformerConfig, init_params, make_train_step)
        cfg = TransformerConfig(
            vocab_size=32000, d_model=2048, n_layers=4, n_heads=16,
            n_kv_heads=16, d_head=128, d_ff=5632, max_seq=4096,
            dtype=jnp.bfloat16)
        params = init_params(jax.random.PRNGKey(0), cfg)
        n_params = sum(x.size
                       for x in jax.tree_util.tree_leaves(params))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 4096), 0,
                                    cfg.vocab_size)
        opt = optax.sgd(1e-4)  # stateless: keeps the bench about compute
        # donate=False: time_scanned replays from the saved x0 after
        # warmup, which a donating step would have already consumed
        step = make_train_step(cfg, opt, donate=False)
        opt_state = opt.init(params)
        # scan-chained like every other row (opt_state/tokens as args,
        # params as the carry — closure-capturing 0.5 GB of params would
        # bake them into the jaxpr as constants); at plain iters=3 the
        # recorded MFU read ~3 points low (BENCH_r02 53.4% vs 56.8%).
        t_train = time_scanned(
            lambda p, os_, tk: step(p, os_, tk)[0], params, opt_state,
            tokens, inner=4, iters=4)
        # 6·P matmul flops per token (fwd 2P + bwd 4P) + attention extra
        train_flops = (6.0 * n_params * tokens.size
                       + 3 * attention_flops(1, cfg.n_heads, 4096, 4096,
                                             cfg.d_head, causal=True)
                       * cfg.n_layers)
        peaks = device_peaks()
        extra["train_step"] = {
            "config": (f"L={cfg.n_layers} d={cfg.d_model} "
                       f"ff={cfg.d_ff} T=4096 bf16"),
            "params_m": round(n_params / 1e6, 1),
            "tokens_per_s": round(tokens.size / t_train, 1),
            "mfu": round(train_flops / t_train / 1e12
                         / peaks["peak_tflops"], 4),
        }

    bench.section("train_step", sec_train)
    gc.collect()

    # --- end-to-end serving: full-model generate() (prefill + scanned
    # decode through the quantized cache) — the framework-level number a
    # kernel-only row can't capture (models/generate.py) ---
    def sec_serving():
        from cuda_flashattention_tpu.models.generate import generate
        from cuda_flashattention_tpu.models.transformer import (
            TransformerConfig, init_params)
        from cuda_flashattention_tpu.utils.timing import time_chained
        cfg = TransformerConfig(
            vocab_size=32000, d_model=2048, n_layers=4, n_heads=16,
            n_kv_heads=4, d_head=128, d_ff=5632, max_seq=8192,
            dtype=jnp.bfloat16)
        params = init_params(jax.random.PRNGKey(0), cfg)
        n_params = sum(x.size
                       for x in jax.tree_util.tree_leaves(params))
        bsz, t_prompt, n_new = 8, 512, 128
        prompt = jax.random.randint(jax.random.PRNGKey(2),
                                    (bsz, t_prompt), 0, cfg.vocab_size)
        for qt in (None, "int8"):
            run = functools.partial(
                generate, params, cfg=cfg, max_new_tokens=n_new,
                max_len=t_prompt + n_new, qtype=qt)
            # the generated tail feeds back as the next prompt, so calls
            # chain on-device; time_chained adds the warmup host
            # readback the tunnelled backend needs (MEMO #22)
            dt = time_chained(lambda p: run(p)[0][:, -t_prompt:],
                              prompt, iters=3, warmup=1)
            tag = qt or "bf16"
            extra[f"serving_e2e_{tag}_tokens_per_s"] = (
                bsz * n_new / dt)
        extra["serving_e2e_config"] = (
            f"generate(): {n_params / 1e6:.0f}M GQA16x4 model, B={bsz} "
            f"prompt={t_prompt} new={n_new}, prefill+decode in one jit, "
            f"greedy")

    bench.section("serving_e2e", sec_serving)
    gc.collect()
    jax.clear_caches()  # free executables before the cache-churn rows

    # --- quantized decode tokens/s vs context (serving shape), MHA and
    # GQA (Hkv = H/4, the shape GQA exists for) ---
    db, dh, dd = 4, 16, 128

    def sec_decode(ctx: int):
        # 16k steps are ~0.05-0.15 ms: long inner scans keep the
        # row-to-row variance under control
        inner, iters = (32, 8) if ctx <= 16384 else (8, 4)
        for hkv in (dh, dh // 4):
            _k, _v = mk((db, hkv, ctx, dd)), mk((db, hkv, ctx, dd))
            dq = mk((db, dh, dd))
            lengths = jnp.full((db,), ctx, jnp.int32)
            tag = "" if hkv == dh else f"_gqa{dh}x{hkv}"
            t_bf16 = time_scanned(
                lambda x, k_, v_: decode_attention(x, k_, v_,
                                                   lengths)[0],
                dq, _k, _v, inner=inner, iters=iters)
            decode[f"bf16_ctx{ctx}{tag}"] = db / t_bf16
            for qt in ("int8", "fp8", "mixed"):
                kv = quantize_kv(_k, _v, qt)
                t = time_scanned(
                    lambda x, kq, vq, ks, vs: decode_attention(
                        x, kq, vq, lengths, k_scale=ks, v_scale=vs)[0],
                    dq, kv.k_q, kv.v_q, kv.k_scale, kv.v_scale,
                    inner=inner, iters=iters)
                decode[f"{qt}_ctx{ctx}{tag}"] = db / t
                # + per-head int8 Q (2x int8 MXU, no K cast) — the GQA
                # serving configuration (VERDICT r2 #2). int8-K caches
                # only; a pure-fp8 cache has no int8 K for the MXU path.
                if qt != "fp8":
                    t = time_scanned(
                        lambda x, kq, vq, ks, vs: decode_attention(
                            x, kq, vq, lengths, k_scale=ks, v_scale=vs,
                            quantize_q=True)[0],
                        dq, kv.k_q, kv.v_q, kv.k_scale, kv.v_scale,
                        inner=inner, iters=iters)
                    decode[f"{qt}_ctx{ctx}{tag}_qq"] = db / t
                del kv
            del _k, _v

    bench.section("decode_16k", lambda: sec_decode(16384))
    gc.collect()
    bench.section("decode_131k", lambda: sec_decode(131072))
    gc.collect()

    # --- windowed decode (sliding-window serving: O(window) work per
    # step regardless of context — VERDICT r2 #6) ---
    def sec_decode_windowed():
        wctx, wwin = 131072, 4096
        _k, _v = mk((db, dh, wctx, dd)), mk((db, dh, wctx, dd))
        dq = mk((db, dh, dd))
        lengths = jnp.full((db,), wctx, jnp.int32)
        t_w = time_scanned(
            lambda x, k_, v_: decode_attention(
                x, k_, v_, lengths, window=wwin)[0],
            dq, _k, _v, inner=32, iters=6)
        decode[f"bf16_ctx{wctx}_win{wwin}"] = db / t_w
        kv = quantize_kv(_k, _v, "int8")
        del _k, _v
        t_w = time_scanned(
            lambda x, kq, vq, ks, vs: decode_attention(
                x, kq, vq, lengths, k_scale=ks, v_scale=vs, window=wwin,
                quantize_q=True)[0],
            dq, kv.k_q, kv.v_q, kv.k_scale, kv.v_scale, inner=32,
            iters=6)
        decode[f"int8_ctx{wctx}_win{wwin}_qq"] = db / t_w

    bench.section("decode_windowed", sec_decode_windowed)
    gc.collect()

    # --- 1M-token context decode, int8 / fp8 / mixed KV (north-star
    # long-context serving; B=1 so the quantized caches fit HBM) ---
    def sec_decode_1m():
        ctx1m = 1 << 20
        dq1 = mk((1, dh, dd))
        len1m = jnp.full((1,), ctx1m, jnp.int32)
        sc = jnp.full((1, dh, ctx1m), 1.0 / 127, jnp.float32)
        k1 = jax.random.randint(jax.random.PRNGKey(7),
                                (1, dh, ctx1m, dd), -127, 128, jnp.int8)
        v1 = jax.random.randint(jax.random.PRNGKey(8),
                                (1, dh, ctx1m, dd), -127, 128, jnp.int8)

        def d1m(kq, vq, **kw):
            return time_scanned(
                lambda x, kq_, vq_, s1, s2: decode_attention(
                    x, kq_, vq_, len1m, k_scale=s1, v_scale=s2, **kw)[0],
                dq1, kq, vq, sc, sc, inner=4, iters=5)

        decode[f"int8_ctx{ctx1m}"] = 1.0 / d1m(k1, v1)
        decode[f"int8_ctx{ctx1m}_qq"] = 1.0 / d1m(k1, v1,
                                                  quantize_q=True)

        # reuse the int8 bit patterns as fp8 codes, zeroing the NaN codes
        def to_fp8(x):
            u = jax.lax.bitcast_convert_type(x, jnp.uint8)
            u = jnp.where((u & 0x7f) == 0x7f, jnp.uint8(0), u)
            return jax.lax.bitcast_convert_type(u, jnp.float8_e4m3fn)

        v8 = jax.jit(to_fp8)(v1)
        del v1  # peak-trim: v1 unused from here (r3 kept 4 caches live)
        # mixed (int8 K / fp8 V) + int8 Q: the fp8-serving configuration
        decode[f"mixed_ctx{ctx1m}_qq"] = 1.0 / d1m(k1, v8,
                                                   quantize_q=True)
        k8 = jax.jit(to_fp8)(k1)
        del k1
        # pure fp8 rides the wide-block default (65536 at 1M capacity;
        # 32768 vs 65536 measured flat at 133 tok/s with the 4-op cast)
        decode[f"fp8_ctx{ctx1m}"] = 1.0 / d1m(k8, v8)

    bench.section("decode_1m", sec_decode_1m)

    # --- assemble + print (ALWAYS prints, whatever failed above) ---
    peaks = device_peaks()
    target = SOL_FRACTION_TARGET * peaks["peak_tflops"]
    tflops_fp8_qq = extra.pop("_fp8_qq", 0.0)
    result = {
        "metric": "fa2_fwd_attention_tflops_per_chip_fp8_kv",
        "value": round(tflops_fp8_qq, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops_fp8_qq / target, 4),
        "extra": {
            "config": (f"B={B} H={H} N={N} d={D} fp8 KV cache; kernel "
                       f"computes QK^T on the 2x int8 MXU path (per-head "
                       f"int8 Q + in-kernel fp8->int8 K re-grid adding "
                       f"<=0.4%-of-absmax int8-class noise, "
                       f"quantize_q=True; accuracy gate 1e-2 vs naive - "
                       f"tests/test_quant.py)"),
            "device": peaks["device_kind"],
            "peak_tflops": peaks["peak_tflops"],
            "timing": ("ops scan-chained inside one jit at TWO scan "
                       "lengths, per-step time = the slope "
                       "(utils/timing.time_scanned) — the tunnelled "
                       "backend's per-dispatch floor varies by day "
                       "(~1-7 ms observed) and any single length "
                       "over-reads by floor/inner; the slope cancels "
                       "it exactly. In-jit chaining is also how the "
                       "ops run inside real train/serving loops"),
            "sol_fraction": round(tflops_fp8_qq / peaks["peak_tflops"],
                                  4),
            "target": "vs_baseline is fraction of 0.70*peak (north star)",
            **{k: round(v, 2) for k, v in extra.items()
               if isinstance(v, float)},
            **{k: v for k, v in extra.items()
               if not isinstance(v, float)},
            "decode_tokens_per_s": {k: round(v, 1)
                                    for k, v in decode.items()},
        },
    }
    if bench.errors:
        result["extra"]["errors"] = bench.errors
    print(json.dumps(result))
    # exit 0 if the headline landed (partial data beats nothing);
    # nonzero only when even the headline is missing
    sys.exit(0 if tflops_fp8_qq > 0 else 1)


if __name__ == "__main__":
    main()
