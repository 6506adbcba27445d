"""Training-step performance: vl_finetune-shaped LLM step + det pretrain.

The reference's dominant workload is training
(reference: scripts/vl_finetune.sh — 7B LLM CE over 2048-token grounded
streams under FSDP; scripts/det_pretrain.sh — DDETR det pretraining).
This benchmark measures single-chip trainstep throughput and MFU:

* ``vl``: the LLaMA-7B-shaped CE train step (4096 hidden, 11008 ffn,
  32114 extended vocab, seq 2048, bf16 compute, fp32 AdamW, full remat).
  A 16 GB v5e chip cannot hold 32 layers of fp32 Adam state, so depth is
  scaled to what fits (params+grads+moments ~= 16 B/param); MFU and
  tokens/s/chip are per-layer quantities that transfer to the full model
  under FSDP, and the extrapolated 32-layer number is printed alongside.
* ``det``: the full-scale det-pretrain step (frozen DINOv2-L -> conv
  pyramid -> DDETR two-stage + Hungarian focal/L1/GIoU losses) at the
  reference's per-GPU batch (det_pretrain.sh).

FLOPs are taken from XLA's own cost model on the compiled step
(``compiled.cost_analysis()['flops']``), not an analytic guess; peak is
the v5e bf16 MXU rate.  Timing fetches the loss scalar every step, which
defeats result caching in remote-execution tunnels.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()

PEAK_FLOPS = {'v5e': 197e12, 'v4': 275e12, 'v5p': 459e12}

# the orchestrator (bench.py) exports this run's hard budget; trim the
# variant list to fit instead of being killed mid-run (r4: the 330 s
# timeout fired after all vl metrics had landed but before det ran)
T0 = time.time()
BUDGET = float(os.environ.get('GROMA_SUB_BUDGET', 1e9))


def _left():
    return BUDGET - (time.time() - T0)


def _peak():
    gen = os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')
    return PEAK_FLOPS.get(gen, 197e12)


def _emit(metric, value, unit, note=''):
    print(json.dumps({'metric': metric, 'value': round(float(value), 3),
                      'unit': unit, 'vs_baseline': round(float(value), 3)}))
    if note:
        print(f'# {note}', file=sys.stderr)


def bench_vl(layers=None, batch=None, seq=2048, steps=4, emit=True,
             optimizer='adamw', fused_ce=False):
    # fused_ce measured wall-neutral on v5e (depth 6: 330 vs 325
    # ms/step; depth 3 adam: 190 vs 172) — it trades the (B, S, V)
    # fp32 HBM round trips for a head-matmul recompute that XLA's
    # unfused pipeline already hides.  The bench default stays the
    # materialized path for round-comparability; the MODEL default
    # (models/groma.py) keeps fused CE for its ~2.6 GB memory win at
    # the b16 VL-finetune shape.
    import jax
    import jax.numpy as jnp
    import optax

    from groma_tpu.config import LlamaConfig
    from groma_tpu.models.llama import LlamaForCausalLM
    from groma_tpu.ops.fused_ce import fused_cross_entropy
    from groma_tpu.train.optimizer import make_adamw
    from groma_tpu.train.steps import TrainState

    on_tpu = jax.devices()[0].platform == 'tpu'
    if layers is None:
        layers, batch, seq, steps = (2, 2, 2048, 12) if on_tpu \
            else (2, 1, 128, 2)
    cfg = LlamaConfig(vocab_size=32114, num_layers=layers,
                      dtype='bfloat16' if on_tpu else 'float32') \
        if on_tpu else LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_layers=layers, num_heads=4, num_kv_heads=4,
            dtype='float32')
    model = LlamaForCausalLM(cfg, remat=True)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, seq)))
    labels = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, seq)))

    params = jax.jit(lambda i: model.init(jax.random.PRNGKey(0), i))(
        ids[:, :8])['params']
    # re-init at full seq shapes is not needed (params are shape-free)
    if optimizer == 'adafactor':
        # factored second moment, no first moment: 8 B/param of state
        # traffic vs fp32 Adam's 16 B/param -> depth 6-8 fits in 16 GB
        # AND the optimizer-update HBM stream halves (an MFU lever: the
        # update is pure bandwidth, ~7 ms/layer at 16 B/param)
        tx = optax.adafactor(1e-5)
    else:
        tx = make_adamw(1e-5, weight_decay=0.0)

    def step(state, ids, labels):
        def loss_fn(p):
            # Pallas flash attention (fwd+bwd 22.6 vs 23.8 ms XLA at
            # b8/h32/s2048/d128, and no (B,H,S,S) score tensor in HBM)
            if fused_ce:
                # chunked-remat CE (ops/fused_ce.py): no (B, S, V)
                # fp32 logits tensor in HBM, the head matmul recomputes
                # in the backward — the r4 MFU lever (VERDICT r3 #5)
                h, _ = model.apply({'params': p}, ids, use_flash=on_tpu,
                                   return_hidden=True)
                ok = jnp.ones(labels[:, 1:].shape, bool)
                return fused_cross_entropy(
                    h[:, :-1], (p['lm_head']['kernel'],),
                    labels[:, 1:], ok)
            logits, _ = model.apply({'params': p}, ids, use_flash=on_tpu)
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            nll = -jnp.take_along_axis(logp, labels[:, 1:, None], -1)
            return nll.mean()
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss

    state = jax.jit(lambda p: TrainState.create(p, tx))(params)
    jit_step = jax.jit(step, donate_argnums=(0,))
    lowered = jit_step.lower(state, ids, labels)
    compiled = lowered.compile()
    flops = compiled.cost_analysis().get('flops', 0.0)

    state, loss = compiled(state, ids, labels)
    float(loss)   # sync after compile+first step
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = compiled(state, ids, labels)
    lv = float(loss)   # ONE final sync: a per-step fetch adds the ~30 ms
    # tunnel round trip to every step (donated state chains steps device-
    # side, so intermediate fetches are pure measurement overhead)
    dt = (time.perf_counter() - t0) / steps

    toks = batch * seq / dt
    mfu = flops / dt / _peak() if flops else 0.0
    if emit:
        _emit('vl_train_step_mfu', mfu * 100, 'percent-of-peak',
              f'vl train: layers={layers} batch={batch} seq={seq} '
              f'{dt * 1000:.0f} ms/step {toks:.0f} tok/s loss={lv:.3f} '
              f'xla_flops={flops:.3g}')
        _emit('vl_train_tokens_per_sec', toks, 'tokens/sec/chip',
              f'extrapolated 32-layer 7B: ~{toks * layers / 32:.0f} '
              f'tok/s/chip (flops-proportional)')
    return dt, flops, toks, mfu


def bench_vl_depth_series(depths=(1, 2, 3, 6), batch=2, seq=2048, steps=8,
                          optimizer='adafactor'):
    """MFU vs LLM depth + the fitted 32-layer number (round-2 verdict #4,
    deepened round 4 per verdict #5).

    fp32 Adam at 7B width fits <=3 decoder layers in 16 GB (16 B/param
    over 202M/layer + 263M embed/head); with adafactor (8 B/param:
    factored second moment, no first moment) depth 6 fits, anchoring the
    affine extrapolation with a deep measured point.  The fit uses the
    SHALLOW depths only and must predict the deepest measured point
    within ~1% (emitted as vl_train_depth_fit_err_pct) — then all points
    feed the fitted 32-layer number.  dt(L) and flops(L) are affine in L
    by construction: per-layer cost + fixed embed/lm_head/CE cost.
    """
    import jax
    on_tpu = jax.devices()[0].platform == 'tpu'
    if not on_tpu:
        depths, batch, seq, steps = (1, 2), 1, 128, 2
    pts = []
    for L in depths:
        # keep at least 3 shallow anchors for the fit; drop deeper points
        # when the budget will not cover ~compile + measure + the det
        # family still to come
        if len(pts) >= 3 and _left() < 60 + 15 * L:
            print(f'# budget trim: skipping depth {L} '
                  f'({_left():.0f}s left)', file=sys.stderr, flush=True)
            break
        dt, flops, toks, mfu = bench_vl(layers=L, batch=batch, seq=seq,
                                        steps=steps, emit=False,
                                        optimizer=optimizer)
        pts.append((L, dt, flops))
        print(json.dumps({
            'metric': f'vl_train_step_mfu_at_depth{L}',
            'value': round(mfu * 100, 3), 'unit': 'percent-of-peak',
            'vs_baseline': round(mfu * 100, 3),
            'depth_proxy': f'measured at {L} of 32 layers '
                           f'({optimizer})'}), flush=True)
        print(f'# depth {L}: {dt * 1000:.0f} ms/step mfu={mfu * 100:.1f}% '
              f'xla_flops={flops:.3g}', file=sys.stderr)
    # affine fit dt(L) = a + b L and flops(L) = fa + fb L -> 32 layers
    Ls = np.array([p[0] for p in pts], np.float64)
    dts = np.array([p[1] for p in pts], np.float64)
    fls = np.array([p[2] for p in pts], np.float64)
    if len(pts) > 3:
        # fit-validation: shallow fit must predict the deepest point
        (vb, va) = np.polyfit(Ls[:-1], dts[:-1], 1)
        fit_err = float(abs(np.polyval((vb, va), Ls[-1]) - dts[-1])
                        / dts[-1])
        print(json.dumps({
            'metric': 'vl_train_depth_fit_err_pct',
            'value': round(fit_err * 100, 3), 'unit': 'percent',
            'vs_baseline': round(fit_err * 100, 3),
            'depth_proxy': f'affine fit on depths {list(depths[:-1])} '
                           f'predicting measured depth {depths[-1]}'}),
            flush=True)
    (b_dt, a_dt) = np.polyfit(Ls, dts, 1)
    (b_fl, a_fl) = np.polyfit(Ls, fls, 1)
    dt32 = a_dt + 32 * b_dt
    fl32 = a_fl + 32 * b_fl
    mfu32 = fl32 / dt32 / _peak()
    resid = float(np.max(np.abs(np.polyval((b_dt, a_dt), Ls) - dts) / dts))
    print(json.dumps({
        'metric': 'vl_train_step_mfu', 'value': round(mfu32 * 100, 3),
        'unit': 'percent-of-peak', 'vs_baseline': round(mfu32 * 100, 3),
        'depth_proxy': f'affine fit from depths {[int(l) for l in Ls]} '
                       f'({optimizer} state, 8 B/param); '
                       f'max fit residual {resid * 100:.1f}%'}), flush=True)
    # metric renamed from vl_train_tokens_per_sec (r03): the r02 artifact
    # reported the shallow-depth proxy under the same name, which read as
    # a phantom 12x regression round-over-round (VERDICT r3 weak #6)
    print(json.dumps({
        'metric': 'vl_train_tokens_per_sec_fitted32',
        'value': round(batch * seq / dt32, 3), 'unit': 'tokens/sec/chip',
        'vs_baseline': round(batch * seq / dt32, 3),
        'depth_proxy': 'fitted 32-layer step time'}), flush=True)
    print(f'# fitted 32L: {dt32 * 1000:.0f} ms/step '
          f'mfu={mfu32 * 100:.1f}% residual={resid * 100:.2f}%',
          file=sys.stderr)
    return mfu32


def bench_det(batch=None, steps=3):
    import jax
    import jax.numpy as jnp
    import optax

    from groma_tpu.config import (DDETRConfig, PerceiverConfig, ViTConfig)
    from groma_tpu.models.perceiver import Perceiver
    from groma_tpu.train.optimizer import (det_lr_mult_rules,
                                           freeze_predicate, make_adamw)
    from groma_tpu.train.steps import TrainState, make_det_train_step

    on_tpu = jax.devices()[0].platform == 'tpu'
    if on_tpu:
        cfg = PerceiverConfig(vit=ViTConfig(dtype='bfloat16'),
                              ddetr=DDETRConfig(dtype='bfloat16'),
                              image_size=448)
        batch = batch or 8
    else:
        from __graft_entry__ import _small_cfg
        cfg = _small_cfg().perceiver
        batch = batch or 2
        steps = 2

    model = Perceiver(cfg)
    img = cfg.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, img, img, 3)),
                         jnp.float32)
    T = 20
    targets = {
        'class_labels': jnp.zeros((batch, T), jnp.int32),
        'boxes': jnp.asarray(rng.uniform(0.2, 0.6, (batch, T, 4)),
                             jnp.float32),
        'valid': jnp.asarray(rng.random((batch, T)) < 0.7),
    }

    params = jax.jit(lambda im: model.init(jax.random.PRNGKey(0), im))(
        images[:1])['params']
    tx = make_adamw(2e-4, weight_decay=1e-4,
                    lr_mult_rules=det_lr_mult_rules(0.1),
                    frozen_pred=freeze_predicate(freeze_vis_encoder=True))
    # the remote-execution tunnel has no host callbacks -> on-device
    # auction matcher (exact scipy LSA is the default on real pods)
    step = make_det_train_step(model, cfg.ddetr, tx, source='coco',
                               matcher='auction' if on_tpu else 'hungarian')
    state = jax.jit(lambda p: TrainState.create(p, tx))(params)
    jit_step = jax.jit(step, donate_argnums=(0,))

    state, losses = jit_step(state, {'images': images, 'targets': targets})
    float(losses['loss'])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, losses = jit_step(state,
                                 {'images': images, 'targets': targets})
    lv = float(losses['loss'])   # one final sync (see bench_vl note)
    dt = (time.perf_counter() - t0) / steps
    _emit('det_train_images_per_sec', batch / dt, 'images/sec/chip',
          f'det train: batch={batch} {dt * 1000:.0f} ms/step loss={lv:.3f}')
    return batch / dt


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('all', 'vl'):
        bench_vl_depth_series()
    # det runs BEFORE the optional adamfp32 point: r4's budget kill cost
    # the det family entirely while the comparison point survived
    if which in ('all', 'det') and _left() > 60:
        bench_det()
    if which in ('all', 'vl') and _left() > 75:
        # one fp32-Adam comparison point: the optimizer-update stream is
        # visible MFU (depth 3: 54.0% adam vs 51.3% adafactor measured
        # r4) — adafactor is the series optimizer only because its
        # 8 B/param state lets depth 6 anchor the fit in 16 GB
        import jax as _jax
        if _jax.devices()[0].platform == 'tpu':
            _, _, _, mfu3 = bench_vl(layers=3, batch=2, steps=8,
                                     emit=False, optimizer='adamw')
            print(json.dumps({
                'metric': 'vl_train_step_mfu_at_depth3_adamfp32',
                'value': round(mfu3 * 100, 3), 'unit': 'percent-of-peak',
                'vs_baseline': round(mfu3 * 100, 3),
                'depth_proxy': 'fp32 Adam (r03 series optimizer) at '
                               'depth 3 of 32'}), flush=True)
    if which == 'vl2':   # single-depth quick mode (round-2 behavior)
        bench_vl()
