#!/usr/bin/env python
"""Parse a jax.profiler xplane trace and print per-op device time.

Usage:
    python tools/parse_trace.py [/tmp/bsvd_tpu_trace] [--top 40] [--group]

Aggregates XEvent durations on the TPU device plane(s) by op name so the
"where does the time go" table in PERF.md can be grounded in a real
on-chip trace instead of ablations (VERDICT round-2 weak item 3 /
PERF.md "Remaining headroom" item 1).
"""

import argparse
import collections
import glob
import os
import re
import sys


def load_xspaces(trace_dir):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(
        trace_dir, 'plugins', 'profile', '*', '*.xplane.pb')))
    if not paths:
        sys.exit(f'no xplane.pb under {trace_dir}')
    spaces = []
    for p in paths[-1:]:      # newest run only
        xs = xplane_pb2.XSpace()
        with open(p, 'rb') as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


GROUP_PATTERNS = [
    ('pallas shift-conv', r'shift_conv|bibuffer'),
    ('pallas conv chain', r'conv_chain'),
    ('pallas conv s2', r'conv_s2'),
    ('pallas conv3x3', r'conv3x3'),
    ('xla convolution', r'^%?convolution|conv_general|cudnn'),
    ('transpose/copy', r'transpose|copy'),
    ('fusion (elementwise)', r'^%?fusion'),
    ('reshape/bitcast', r'reshape|bitcast'),
    ('dynamic-slice/concat', r'slice|concatenate|pad'),
    ('infeed/outfeed/dma', r'infeed|outfeed|dma|send|recv'),
]


def group_name(name):
    for g, pat in GROUP_PATTERNS:
        if re.search(pat, name, re.IGNORECASE):
            return g
    return 'other'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('trace_dir', nargs='?', default='/tmp/bsvd_tpu_trace')
    ap.add_argument('--top', type=int, default=40)
    ap.add_argument('--group', action='store_true',
                    help='aggregate ops into coarse groups')
    ap.add_argument('--line-filter', default='XLA Ops|TensorFlow Ops|Steps',
                    help='regex of line names to include (device planes)')
    args = ap.parse_args()

    for path, xs in load_xspaces(args.trace_dir):
        print(f'== {path}')
        for plane in xs.planes:
            if 'TPU' not in plane.name and 'device' not in plane.name.lower():
                continue
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            per_op = collections.Counter()
            per_op_count = collections.Counter()
            line_names = set()
            for line in plane.lines:
                # keep only the synchronous XLA op line: 'Async XLA Ops'
                # double-counts overlapped DMA and 'XLA Modules' carries one
                # whole-program event
                if line.name != 'XLA Ops':
                    continue
                line_names.add(line.name)
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    per_op[name] += ev.duration_ps
                    per_op_count[name] += 1
            if not per_op:
                continue
            total = sum(per_op.values())
            print(f'-- plane: {plane.name}  lines: {sorted(line_names)[:6]}')
            print(f'   total device time: {total / 1e12 * 1e3:.3f} ms')
            if args.group:
                per_g = collections.Counter()
                for name, ps in per_op.items():
                    per_g[group_name(name)] += ps
                for g, ps in per_g.most_common():
                    print(f'   {ps / 1e9:10.3f} ms  {ps / total * 100:5.1f}%  {g}')
            for name, ps in per_op.most_common(args.top):
                print(f'   {ps / 1e9:10.3f} ms  {ps / total * 100:5.1f}%  '
                      f'x{per_op_count[name]:<4d} {name[:110]}')


if __name__ == '__main__':
    main()
