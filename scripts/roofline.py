"""Roofline / MFU report for the three flagship models (VERDICT r2 #7).

For each model x {train step, eval forward} at the bench operating shapes:
  - FLOPs + HBM bytes from XLA's own cost analysis of the compiled HLO
    (compiled.cost_analysis() — the compiler's static count, not a guess)
  - measured wall time per step on the real chip (K executions enqueued,
    ONE host fetch — block_until_ready is a no-op through the tunnel)
  - effective FLOP/s, MFU vs the v5e MXU peaks, and HBM utilization

v5e peaks used: 197 TFLOP/s bf16, ~49 TFLOP/s f32 (MXU f32 runs at 1/4 the
bf16 rate), 819 GB/s HBM.

Usage: python scripts/roofline.py [--models second,parta2,pointpillar]
Writes ROOFLINE.json and a markdown table to stdout (paste into PERF_NOTES).
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', str(ROOT / '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import numpy as np

PEAK_BF16 = 197e12
PEAK_F32 = 49e12
PEAK_HBM = 819e9

sys.path.insert(0, str(ROOT / 'scripts'))
from bench_models import realistic_cfg, build, fetch  # noqa: E402


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get('flops', 0.0)), float(
            ca.get('bytes accessed', 0.0))
    except Exception as e:  # tunnel backends may not expose it
        print('cost_analysis unavailable: %r' % e, file=sys.stderr)
        return 0.0, 0.0


def _measure(run, warmup=2, iters=10):
    for _ in range(warmup):
        fetch(run())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = run()
    fetch(out)
    return (time.perf_counter() - t0) / iters


def roofline_model(name, cfg_yaml, batch_size):
    import jax
    from pcdet_tpu.train.optimization import build_optimizer_and_schedule
    from pcdet_tpu.train.train_state import (create_train_state,
                                             make_eval_forward,
                                             make_train_step)
    rows = []

    # ---- eval forward
    cfg = realistic_cfg(cfg_yaml)
    model, batch = build(cfg, training=False, batch_size=batch_size)
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    fwd = make_eval_forward(model)
    params = variables['params']
    stats = variables.get('batch_stats', {})
    lowered = fwd.lower(params, stats, batch)
    compiled = lowered.compile()
    flops, hbm = _cost(compiled)
    dt = _measure(lambda: fwd(params, stats, batch))
    rows.append(dict(model=name, phase='eval', batch=batch_size,
                     step_ms=dt * 1e3, fps_chip=batch_size / dt,
                     tflops=flops / 1e12, eff_tflops_s=flops / dt / 1e12,
                     mfu_f32=flops / dt / PEAK_F32,
                     mfu_bf16=flops / dt / PEAK_BF16,
                     hbm_gb=hbm / 1e9,
                     hbm_util=hbm / dt / PEAK_HBM))

    # ---- train step
    cfg = realistic_cfg(cfg_yaml)
    model, batch = build(cfg, training=True, batch_size=batch_size)
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    tx, _ = build_optimizer_and_schedule(cfg.MODEL.TRAIN.OPTIMIZATION, 10, 2)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, donate=False)
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    flops, hbm = _cost(compiled)

    holder = {'state': state}

    def run():
        new_state, tb = step(holder['state'], batch)
        holder['state'] = new_state
        return tb['loss']

    dt = _measure(run)
    rows.append(dict(model=name, phase='train', batch=batch_size,
                     step_ms=dt * 1e3, fps_chip=batch_size / dt,
                     tflops=flops / 1e12, eff_tflops_s=flops / dt / 1e12,
                     mfu_f32=flops / dt / PEAK_F32,
                     mfu_bf16=flops / dt / PEAK_BF16,
                     hbm_gb=hbm / 1e9,
                     hbm_util=hbm / dt / PEAK_HBM))
    return rows


MODELS = {
    'pointpillar': ('pointpillar.yaml', 8),
    'second': ('second.yaml', 8),
    'parta2': ('PartA2.yaml', 2),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--models', default='pointpillar,second,parta2')
    args = ap.parse_args()
    all_rows = []
    for m in args.models.split(','):
        yaml_name, bs = MODELS[m]
        rows = roofline_model(m, yaml_name, bs)
        all_rows += rows
        for r in rows:
            print(json.dumps(r))

    # merge over prior rows (keyed by model+phase+batch) so a partial
    # refresh — e.g. the sparse models after a kernel-default change —
    # keeps the other models' rows
    path = ROOT / 'ROOFLINE.json'
    merged = {}
    if path.exists():
        merged = {(r['model'], r['phase'], r['batch']): r
                  for r in json.loads(path.read_text())}
    merged.update({(r['model'], r['phase'], r['batch']): r
                   for r in all_rows})
    with open(path, 'w') as f:
        json.dump(list(merged.values()), f, indent=1)

    print('\n| model | phase | B | step ms | fps/chip | TFLOP/step | '
          'eff TFLOP/s | MFU(f32) | HBM GB/step | HBM util |')
    print('|---|---|---|---|---|---|---|---|---|---|')
    for r in all_rows:
        print('| %s | %s | %d | %.1f | %.2f | %.3f | %.2f | %.1f%% | '
              '%.2f | %.1f%% |'
              % (r['model'], r['phase'], r['batch'], r['step_ms'],
                 r['fps_chip'], r['tflops'], r['eff_tflops_s'],
                 100 * r['mfu_f32'], r['hbm_gb'], 100 * r['hbm_util']))


if __name__ == '__main__':
    main()
