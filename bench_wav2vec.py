#!/usr/bin/env python
"""Second-model-family benchmark: wav2vec2-base intent model on one chip.

The reference's wav2vec path fine-tunes ``facebook/wav2vec2-base`` with an
attention-pooling intent head (orphaned pyc modules; SURVEY.md §2 rows
9-10).  This measures the TPU-native rebuild at the real base size
(12 layers, hidden 768, ~94.4M backbone params) with random-initialized
weights — the architecture and therefore the speed are identical to a
pretrained fine-tune; the weights can't be downloaded here (zero egress).

Reports, as one JSON line:
  * bf16 inference throughput (utterances/s, 3 s utterances, batch 64)
  * fine-tune step time (AdamW, frozen feature extractor — the reference
    trainer's configuration) and the projected FSC fine-tune epoch time
    (23,132 train utterances, batch 16).

Methodology matches bench.py: scalar-carry chaining + best-of-k rounds
(the tunnel link has high variance; see CLAUDE.md), clean exit 3 skip on
tunnel outages.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

_FSC_TRAIN_UTTS = 23132


def main() -> int:
    from speech_intent_recognizer_tpu.utils.platform import (
        configure_jax, wait_for_backend)
    if not wait_for_backend():
        print(json.dumps({
            "metric": "wav2vec_inference_throughput", "value": None,
            "unit": "utterances/sec/chip",
            "error": "accelerator backend unavailable (tunnel outage)"}))
        return 3

    configure_jax()
    import jax
    import jax.numpy as jnp
    from transformers import Wav2Vec2Config

    from speech_intent_recognizer_tpu.models.wav2vec import (
        Wav2VecIntent, feature_extractor_mask, init_wav2vec)
    from speech_intent_recognizer_tpu.train.wav2vec_trainer import (
        Wav2VecTrainer, create_wav2vec_optimizer)

    # Wav2Vec2Config() defaults ARE facebook/wav2vec2-base: hidden 768,
    # 12 post-LN layers, group-norm feature extractor, conv_dim (512,)*7.
    config = Wav2Vec2Config()
    num_classes = 31
    seconds = 3.0  # FSC utterances are ~2-4 s
    n_samples = int(seconds * 16000)

    rng = np.random.default_rng(0)

    def audio(batch):
        t = np.arange(n_samples) / 16000.0
        base = 0.25 * np.sin(2 * np.pi * 220.0 * t)[None, :]
        x = (base + 0.05 * rng.standard_normal((batch, n_samples)))
        return jnp.asarray(x, jnp.float32)

    def time_fn(fn, *args, iters=10, rounds=4):
        float(fn(*args, jnp.float32(0)))  # compile + warmup
        best = float("inf")
        for _ in range(rounds):
            s = jnp.float32(0)
            t0 = time.perf_counter()
            for _ in range(iters):
                s = fn(*args, s)
            float(s)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    # ---- bf16 inference (the serving configuration) ----
    model_inf = Wav2VecIntent(config=config, num_classes=num_classes,
                              compute_dtype=jnp.bfloat16)
    variables = init_wav2vec(model_inf, jax.random.key(0),
                             input_length=n_samples)

    batch = 64
    x = audio(batch)
    mask = jnp.ones((batch, n_samples), jnp.int32)

    @jax.jit
    def fwd(v, x, mask, s):
        logits = model_inf.apply(v, x, mask, train=False)
        return jnp.sum(logits).astype(jnp.float32) + s

    sec_inf = time_fn(fwd, variables, x, mask)
    utt_s = batch / sec_inf

    # Stage isolation: the 7-layer conv feature extractor vs the rest
    # (projection + 12 transformer layers + pooling head).  ~15 of the
    # ~42 GFLOP/utt live in the extractor.
    from speech_intent_recognizer_tpu.models.wav2vec_flax import (
        FeatureEncoder)
    fe = FeatureEncoder(config, dtype=jnp.bfloat16)
    fe_params = variables["params"]["wav2vec2"]["feature_extractor"]

    @jax.jit
    def fe_fwd(p, x, s):
        feats = fe.apply({"params": p}, x)
        return jnp.sum(feats).astype(jnp.float32) + s

    sec_fe = time_fn(fe_fwd, fe_params, x)

    # ---- fine-tune step (fp32 params, reference recipe: AdamW, frozen
    # feature extractor) ----
    model_tr = Wav2VecIntent(config=config, num_classes=num_classes,
                             compute_dtype=jnp.bfloat16)
    variables_tr = init_wav2vec(model_tr, jax.random.key(1),
                                input_length=n_samples)
    params = variables_tr["params"]
    tx = create_wav2vec_optimizer(
        lr=1e-4, freeze_mask=feature_extractor_mask(params))
    trainer = Wav2VecTrainer(model_tr, tx, num_classes=num_classes,
                             max_length=n_samples)
    step, _evaluate = trainer._build()
    opt_state = tx.init(params)

    tb = 16
    xt = audio(tb)
    mt = jnp.ones((tb, n_samples), jnp.int32)
    yt = jnp.asarray(rng.integers(0, num_classes, tb), jnp.int32)

    # chain through params so successive steps cannot overlap dishonestly
    state = {"p": params, "o": opt_state}

    def one_step(state):
        p, o, loss, _acc = step(state["p"], state["o"], xt, mt, yt,
                                jax.random.key(2), jnp.asarray(jnp.inf))
        return {"p": p, "o": o}, loss

    state, loss0 = one_step(state)  # compile + warmup
    float(loss0)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        loss = None
        for _ in range(5):
            state, loss = one_step(state)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / 5)
    steps_per_epoch = -(-_FSC_TRAIN_UTTS // tb)
    epoch_s = best * steps_per_epoch

    # ---- TPU-native large-batch fine-tune recipe
    # (configs/wav2vec_large_batch.yaml): b64, warmup+cosine AdamW,
    # frozen-extractor and full variants ----
    lb = 64
    xl = audio(lb)
    ml = jnp.ones((lb, n_samples), jnp.int32)
    yl = jnp.asarray(rng.integers(0, num_classes, lb), jnp.int32)
    lb_results = {}
    for variant in ("frozen", "full"):
        freeze = (feature_extractor_mask(params) if variant == "frozen"
                  else None)
        tx_lb = create_wav2vec_optimizer(
            lr=3e-4, warmup_steps=steps_per_epoch // 4,
            decay_steps=steps_per_epoch * 20, freeze_mask=freeze)
        trainer_lb = Wav2VecTrainer(model_tr, tx_lb,
                                    num_classes=num_classes,
                                    max_length=n_samples)
        step_lb, _ = trainer_lb._build()
        opt_lb = tx_lb.init(params)
        st = {"p": params, "o": opt_lb}

        def one_lb(st):
            p, o, loss, _ = step_lb(st["p"], st["o"], xl, ml, yl,
                                    jax.random.key(3), jnp.asarray(jnp.inf))
            return {"p": p, "o": o}, loss

        st, l0 = one_lb(st)
        float(l0)
        best_lb = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loss = None
            for _ in range(4):
                st, loss = one_lb(st)
            float(loss)
            best_lb = min(best_lb, (time.perf_counter() - t0) / 4)
        lb_steps = -(-_FSC_TRAIN_UTTS // lb)
        lb_results[variant] = {
            "step_ms_b64": round(best_lb * 1e3, 3),
            "projected_fsc_epoch_s": round(best_lb * lb_steps, 1),
            "utt_per_s": round(lb / best_lb, 1),
        }

    # ---- MFU: FLOPs from HLO cost analysis, v5e bf16 peak 197 TFLOP/s ----
    V5E_BF16_PEAK = 197e12

    def _flops(jitted, *args):
        try:
            ca = jitted.lower(*args).cost_analysis()
            if ca is None:
                # The tunnelled accel backend does not expose HLO cost
                # analysis; re-lower for CPU from shape/dtype specs only
                # (no transfers) — the traced math's FLOP count is
                # backend-independent.
                specs = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
                    args)
                with jax.default_device(jax.devices("cpu")[0]):
                    ca = jitted.lower(*specs).cost_analysis()
            f = float(ca.get("flops", 0.0))
            return f if f > 0 else None
        except Exception:
            return None

    fl_inf = _flops(fwd, variables, x, mask, jnp.float32(0))
    mfu_inf = (fl_inf / sec_inf / V5E_BF16_PEAK) if fl_inf else None
    fl_step = _flops(step, params, opt_state, xt, mt, yt, jax.random.key(2),
                     jnp.asarray(jnp.inf))
    mfu_step = (fl_step / best / V5E_BF16_PEAK) if fl_step else None

    print(json.dumps({
        "metric": "wav2vec_inference_throughput",
        "value": round(utt_s, 2),
        "unit": "utterances/sec/chip (wav2vec2-base, 3 s audio, bf16, b64)",
        "detail": {
            "inference_ms_per_batch": round(sec_inf * 1e3, 3),
            "feature_extractor_ms": round(sec_fe * 1e3, 3),
            "encoder_and_head_ms": round((sec_inf - sec_fe) * 1e3, 3),
            "finetune_step_ms_b16": round(best * 1e3, 3),
            "projected_fsc_epoch_s": round(epoch_s, 1),
            "large_batch_recipe": lb_results,
            "inference_mfu_vs_v5e_bf16_peak": (round(mfu_inf, 4)
                                               if mfu_inf else None),
            "finetune_b16_mfu_vs_v5e_bf16_peak": (round(mfu_step, 4)
                                                  if mfu_step else None),
            "hidden_size": config.hidden_size,
            "num_layers": config.num_hidden_layers,
        }}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
