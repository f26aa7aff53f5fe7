"""A/B stream-verification harness for codec kernel changes.

Every Pallas kernel change MUST prove byte-identical streams + decoded
volumes against the committed kernel before landing (CLAUDE.md: an entire
session's work was once lost because this harness only lived in /tmp).
The tool has three modes:

  dump     encode + decode a fixed deterministic workload at several bsub
           values and pickle {streams, volumes, crcs} to a file.
  compare  byte-compare two dump files (streams AND volumes).
  cross    decode the STREAMS of a dump file through the CURRENT tree's
           codec and check the volumes match (catches changes that move
           both encoder and decoder the same wrong way).
  ab       orchestrate all of it against a pristine-HEAD git worktree:
           dump there, dump here, compare, cross-decode HEAD's streams.

Typical gate before committing a kernel change (run on the real TPU —
interpret mode does not exercise Mosaic):

  python -m imgcomp_cvpr_tpu.tools.ab_streams ab

Workload: random-init pc params + uniform random symbols at a Kodak-ratio
latent shape, batch 8, encoded at bsub 1/2/4/8 (streams must be bitwise
identical across bsub — the batch index never enters the step math). Use
--impl planar --k 5 for the planar K=5 codec (bsub 1/2/4/8 likewise).
Replaces the round 4-6 /tmp/dump_streams.py pattern.
"""

from __future__ import annotations

import argparse
import os
import pickle
import subprocess
import sys
import tempfile


def _build(shape, L, k, seed):
    import jax
    import numpy as np
    from imgcomp_cvpr_tpu.coding import codec as codec_lib
    from imgcomp_cvpr_tpu.models import probclass as pc_lib
    from imgcomp_cvpr_tpu.utils import config as config_lib

    pc_config, _ = config_lib.parse_spec('cvpr/res_shallow', 'pc')
    pc_config = pc_config.replace(kernel_size=k)
    pc = pc_lib.ProbClassifier(pc_config, L)
    rng = np.random.RandomState(seed)
    pc_params = pc.init(jax.random.PRNGKey(seed + 1),
                        (1, shape[1], shape[2], shape[0]))
    centers = np.linspace(-2.0, 2.0, L).astype(np.float32)
    return pc, pc_config, pc_params, centers, rng, codec_lib


def cmd_dump(args):
    shape = tuple(args.shape)
    pc, cfg, params, centers, rng, codec_lib = _build(
        shape, args.L, args.k, args.seed)
    import numpy as np
    syms = rng.randint(0, args.L, size=(args.batch,) + shape).astype(np.int8)
    out = {'shape': shape, 'L': args.L, 'k': args.k, 'seed': args.seed,
           'batch': args.batch, 'impl': args.impl, 'cases': {}}
    env_var = ('IMGCOMP_PLANAR_BSUB' if args.impl == 'planar'
               else 'IMGCOMP_PALLAS_BSUB')
    for bsub in args.bsubs:
        if args.batch % bsub:
            continue
        os.environ[env_var] = str(bsub)
        # fresh codec per bsub: kernel caches key on env-forced bsub only
        # at build time
        codec = codec_lib.LatentCodec(pc, cfg, impl=args.impl)
        res = codec.encode_batch(params, syms, centers)
        dec = codec.decode_batch(params, [r.bitstream for r in res], centers)
        np.testing.assert_array_equal(dec, syms.astype(np.int32))
        # Parsed payloads (words/states/crc via THIS tree's deserializer):
        # the container-version-agnostic identity surface — compare these
        # across trees when a container format change legitimately moves
        # the raw bytes (e.g. a version bump).
        payloads = []
        for r in res:
            parsed = codec_lib.deserialize_stream(r.bitstream)
            words, states, crc = parsed[1], parsed[2], parsed[3]
            payloads.append({'words': np.asarray(words, np.uint32),
                             'states': np.asarray(states, np.uint32),
                             'crc': int(crc)})
        out['cases'][bsub] = {
            'streams': [r.bitstream for r in res],
            'volumes': np.asarray(dec),
            'payload': payloads,
        }
        print(f'  dump: impl={args.impl} bsub={bsub} ok '
              f'({sum(len(r.bitstream) for r in res)} stream bytes)')
    os.environ.pop(env_var, None)
    bsubs = sorted(out['cases'])
    for b in bsubs[1:]:
        for i, (s0, s1) in enumerate(zip(out['cases'][bsubs[0]]['streams'],
                                         out['cases'][b]['streams'])):
            assert s0 == s1, (
                f'streams differ across bsub {bsubs[0]} vs {b} (image {i}) '
                '— bsub-dependent streams are a kernel bug')
    with open(args.out, 'wb') as f:
        pickle.dump(out, f)
    print(f'  dump: wrote {args.out} (bsubs {bsubs}, '
          'streams bsub-invariant)')


def _load(path):
    with open(path, 'rb') as f:
        return pickle.load(f)


def cmd_compare(args):
    import numpy as np
    a, b = _load(args.a), _load(args.b)
    for key in ('shape', 'L', 'k', 'seed', 'batch', 'impl'):
        assert a[key] == b[key], (key, a[key], b[key])
    common = sorted(set(a['cases']) & set(b['cases']))
    assert common, 'no common bsub cases'
    payload_only = getattr(args, 'payload_only', False)
    n_bad = 0
    for bsub in common:
        ca, cb = a['cases'][bsub], b['cases'][bsub]
        if payload_only:
            # Container-version-agnostic: words + states + CRC as parsed
            # by EACH tree's own deserializer at dump time. The gate for
            # kernel changes that land together with a format bump.
            assert 'payload' in ca and 'payload' in cb,                 'payload-only compare needs dumps made by a tool new '                 'enough to store parsed payloads'
            for i, (pa, pb) in enumerate(zip(ca['payload'], cb['payload'])):
                for f in ('words', 'states'):
                    if not np.array_equal(pa[f], pb[f]):
                        print(f'PAYLOAD {f.upper()} MISMATCH bsub={bsub} '
                              f'image={i}')
                        n_bad += 1
                if pa['crc'] != pb['crc']:
                    print(f'PAYLOAD CRC MISMATCH bsub={bsub} image={i}')
                    n_bad += 1
        else:
            for i, (sa, sb) in enumerate(zip(ca['streams'], cb['streams'])):
                if sa != sb:
                    print(f'STREAM MISMATCH bsub={bsub} image={i}: '
                          f'{len(sa)} vs {len(sb)} bytes')
                    n_bad += 1
        if not np.array_equal(ca['volumes'], cb['volumes']):
            print(f'VOLUME MISMATCH bsub={bsub}')
            n_bad += 1
    if n_bad:
        print(f'compare: {n_bad} mismatches between {args.a} and {args.b}')
        return 1
    what = 'payloads (words/states/crc)' if payload_only else 'streams'
    print(f'compare: {what} byte-identical across bsubs {common}')
    return 0


def cmd_cross(args):
    """Decode the dump's streams with the CURRENT tree; volumes must match."""
    import numpy as np
    d = _load(args.a)
    pc, cfg, params, centers, _, codec_lib = _build(
        tuple(d['shape']), d['L'], d['k'], d['seed'])
    bsub = sorted(d['cases'])[0]
    case = d['cases'][bsub]
    codec = codec_lib.LatentCodec(pc, cfg, impl=d['impl'])
    dec = codec.decode_batch(params, case['streams'], centers)
    np.testing.assert_array_equal(dec, case['volumes'])
    print(f'cross: decoded {len(case["streams"])} streams from {args.a} '
          'byte-identically with the current tree')
    return 0


def cmd_ab(args):
    """Dump in a pristine-HEAD worktree AND here; compare; cross-decode."""
    repo = subprocess.check_output(
        ['git', 'rev-parse', '--show-toplevel'], text=True).strip()
    head = subprocess.check_output(
        ['git', 'rev-parse', 'HEAD'], text=True, cwd=repo).strip()
    wt = args.worktree or os.path.join(tempfile.gettempdir(),
                                       f'ab_head_{head[:12]}')
    if not os.path.isdir(wt):
        subprocess.check_call(['git', 'worktree', 'add', '--detach', wt,
                               head], cwd=repo)
        print(f'ab: created HEAD worktree {wt} @ {head[:12]}')
    # The HARNESS is not the code under test: run THIS tool version in the
    # worktree too, so new dump fields (e.g. parsed payloads) exist on
    # both sides even when HEAD predates them.
    import shutil
    wt_tool = os.path.join(wt, 'imgcomp_cvpr_tpu', 'tools', 'ab_streams.py')
    shutil.copy(os.path.abspath(__file__), wt_tool)
    dump_a = os.path.join(tempfile.gettempdir(), 'ab_streams_head.pkl')
    dump_b = os.path.join(tempfile.gettempdir(), 'ab_streams_work.pkl')
    base = [sys.executable, '-m', 'imgcomp_cvpr_tpu.tools.ab_streams',
            'dump', '--shape'] + [str(s) for s in args.shape] + [
            '--L', str(args.L), '--k', str(args.k), '--seed', str(args.seed),
            '--batch', str(args.batch), '--impl', args.impl,
            '--bsubs'] + [str(b) for b in args.bsubs]
    env = dict(os.environ)
    print('ab: dumping streams from pristine HEAD...')
    try:
        subprocess.check_call(base + ['--out', dump_a], cwd=wt, env=env)
    finally:
        # leave the (reused) worktree pristine; the copy is re-made per run
        subprocess.call(['git', 'checkout', '--',
                         'imgcomp_cvpr_tpu/tools/ab_streams.py'], cwd=wt)
    print('ab: dumping streams from the working tree...')
    subprocess.check_call(base + ['--out', dump_b], cwd=repo, env=env)
    rc = subprocess.call(
        [sys.executable, '-m', 'imgcomp_cvpr_tpu.tools.ab_streams',
         'compare', dump_a, dump_b]
        + (['--payload-only'] if args.payload_only else []),
        cwd=repo, env=env)
    if not args.payload_only:
        # cross-decoding other-version containers is impossible by design
        rc |= subprocess.call(
            [sys.executable, '-m', 'imgcomp_cvpr_tpu.tools.ab_streams',
             'cross', dump_a], cwd=repo, env=env)
    print('ab: PASS — streams and volumes byte-identical vs HEAD, and '
          'HEAD streams cross-decode' if rc == 0 else
          'ab: FAIL — see mismatches above')
    return rc


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU backend (interpret-mode kernels; '
                        'Mosaic-level changes still need the real chip)')
    sub = p.add_subparsers(dest='cmd', required=True)

    def common(sp):
        sp.add_argument('--shape', type=int, nargs=3, default=[16, 24, 36])
        sp.add_argument('--L', type=int, default=6)
        sp.add_argument('--k', type=int, default=3)
        sp.add_argument('--seed', type=int, default=0)
        sp.add_argument('--batch', type=int, default=8)
        sp.add_argument('--impl', default='pallas',
                        choices=['pallas', 'planar', 'ring', 'direct'])
        sp.add_argument('--bsubs', type=int, nargs='+', default=[1, 2, 4, 8])

    sp = sub.add_parser('dump')
    common(sp)
    sp.add_argument('--out', required=True)
    sp.set_defaults(fn=cmd_dump)
    sp = sub.add_parser('compare')
    sp.add_argument('a')
    sp.add_argument('b')
    sp.add_argument('--payload-only', action='store_true', dest='payload_only')
    sp.set_defaults(fn=cmd_compare)
    sp = sub.add_parser('cross')
    sp.add_argument('a')
    sp.set_defaults(fn=cmd_cross)
    sp = sub.add_parser('ab')
    common(sp)
    sp.add_argument('--worktree', default=None)
    sp.add_argument('--payload-only', action='store_true', dest='payload_only',
                    help='compare parsed words/states/crc instead of raw '
                         'container bytes (for changes that bump the '
                         'container version; skips the cross-decode step)')
    sp.set_defaults(fn=cmd_ab)
    args = p.parse_args(argv)
    if args.cpu or os.environ.get('IMGCOMP_AB_CPU') == '1':
        # The axon sitecustomize overrides JAX_PLATFORMS env vars; the
        # config update after import is the only way to force CPU here
        # (tests/conftest.py does the same). Propagates to `ab`
        # subprocesses via the env var.
        os.environ['IMGCOMP_AB_CPU'] = '1'
        import jax
        jax.config.update('jax_platforms', 'cpu')
    return args.fn(args) or 0


if __name__ == '__main__':
    sys.exit(main())
