"""Per-instruction HBM byte breakdown of a compiled eval step.

ROOFLINE.json says PointPillar eval moves 71 GB/step at B8 (86% HBM util)
by XLA's aggregate cost analysis — but WHICH ops carry the bytes decides
the next lever (deeper bf16? scatter init? a fusion?).  This script
compiles the eval forward at bench shapes and sums every HLO
instruction's OUTPUT buffer bytes from the optimized module text, grouped
by opcode, printing the top whales.  Output bytes once per instruction is
an under-count vs cost_analysis (which adds operand reads), but the
RANKING is what matters.

Usage: python scripts/profile_hbm_ops.py [--models pointpillar,second]
                                         [--batch_size 8] [--top 25]
"""
import argparse
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / 'scripts'))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', str(ROOT / '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

from bench_models import realistic_cfg, build  # noqa: E402

DTYPE_BYTES = {'f64': 8, 'f32': 4, 'bf16': 2, 'f16': 2, 'f8e4m3fn': 1,
               's64': 8, 'u64': 8, 's32': 4, 'u32': 4, 's16': 2, 'u16': 2,
               's8': 1, 'u8': 1, 'pred': 1}
_ARRAY_RE = re.compile(r'\b([a-z0-9]+)\[([0-9,]*)\]')


def _shape_bytes(type_str):
    total = 0
    for dt, dims in _ARRAY_RE.findall(type_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def analyze(hlo_text, top):
    by_op = defaultdict(int)
    inst = []
    for line in hlo_text.splitlines():
        line = line.strip()
        # "%name = TYPE opcode(...)" — TYPE may be a tuple of arrays
        m = re.match(r'%?[\w.-]+ = (\(?[a-z0-9]+\[[^=]*?)\s*([a-z-]+)\(',
                     line)
        if not m:
            continue
        ty, opcode = m.groups()
        if opcode in ('parameter',):
            continue
        b = _shape_bytes(ty)
        if not b:
            continue
        by_op[opcode] += b
        inst.append((b, opcode, line[:140]))
    inst.sort(reverse=True)
    print('-- bytes by opcode (output buffers once):')
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print('  %-22s %8.2f MB' % (op, b / 1e6))
    print('-- top instructions:')
    for b, opcode, line in inst[:top]:
        print('  %8.2f MB  %s' % (b / 1e6, line))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--models', default='pointpillar')
    ap.add_argument('--batch_size', type=int, default=8)
    ap.add_argument('--top', type=int, default=25)
    args = ap.parse_args()

    import jax
    from pcdet_tpu.train.train_state import make_eval_forward

    yamls = {'pointpillar': 'pointpillar.yaml', 'second': 'second.yaml',
             'parta2': 'PartA2.yaml'}
    for name in args.models.split(','):
        cfg = realistic_cfg(yamls[name])
        model, batch = build(cfg, training=False,
                             batch_size=args.batch_size)
        variables = model.init_variables(jax.random.PRNGKey(0), batch)
        fwd = make_eval_forward(model)
        compiled = fwd.lower(variables['params'],
                             variables.get('batch_stats', {}),
                             batch).compile()
        print('==== %s eval B%d' % (name, args.batch_size))
        analyze(compiled.as_text(), args.top)


if __name__ == '__main__':
    main()
