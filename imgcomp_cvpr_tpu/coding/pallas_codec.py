"""Driver for the monolithic Pallas wavefront codec (pallas_kernel.py).

Same external contract as coding/codec.py's LatentCodec scan paths:
encode is teacher-forced through the SAME kernel executable decode uses
(bit-exactness by construction), the reverse interleaved-rANS encode runs
on device, and only streams/scalars cross the host link. Unlike the XLA
impls, streams are batch-size independent (the batch index never enters
the kernel's step math), so a file encoded at B=8 decodes fine at B=1.

Replaces ref bit_counter.py:13-74's per-image Python round-trip driver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import probclass as pc_lib
from . import pallas_kernel as pk
from . import rans


def _use_interpret() -> bool:
    return jax.default_backend() != 'tpu'


# Container precision byte <-> ring precision (pallas_kernel.make_forward):
# streams are only decodable at their own precision.
_PREC_ID = {'f32': 0, 'bf16': 1, 'f8': 2}
_PREC_FROM_ID = {v: k for k, v in _PREC_ID.items()}
# Max images per kernel instance per precision: ring VMEM halves at each
# step down (f32 rings fit 2 at Kodak scale but f32 stays the unbatched
# oracle path; bf16 fits 4; f8 inner rings fit 8).
_PREC_BSUB_CAP = {'f32': 1, 'bf16': 4, 'f8': 8}


class PallasCoder:
    """Entropy codec for one (pc_config, num_centers) context model, running
    the whole wavefront scan in one Pallas kernel. kernel_size must be 3.

    With a mesh, image batches are sharded over the mesh's data axis via
    shard_map (each device runs the identical per-shard kernel; streams are
    per-image, so the parallelism is exact — SURVEY §2 "per-device image
    sharding"). Batch size must divide the device count evenly."""

    def __init__(self, pc: pc_lib.ProbClassifier, pc_config, mesh=None):
        assert pc_config.kernel_size == 3, 'pallas codec requires K=3'
        self.pc = pc
        self.pc_config = pc_config
        self.kf = pc_config.arch_param__k
        self.L = pc.num_centers
        self.mesh = mesh
        # Adaptive stream-row prediction (see encode_batch_submit): rows of
        # the stream buffer the NEXT batch's row-selection gather will
        # fetch, keyed per kernel layout, learned from the last batch.
        self._rneed_pred = {}

    def _shard_wrap(self, fn, n_in_batch, n_out):
        """shard_map fn over the data axis: first args replicated params/
        centers, last n_in_batch args batch-sharded; all outputs sharded."""
        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import PartitionSpec as P
        from ..parallel import mesh as mesh_lib
        d = P(mesh_lib.DATA_AXIS)
        in_specs = (P(), P()) + (d,) * n_in_batch
        return jax.jit(jax.shard_map(
            fn, mesh=self.mesh, in_specs=in_specs,
            out_specs=(d,) * n_out if n_out > 1 else d,
            check_vma=False))

    # -- per-shape cached device constants -----------------------------------

    @functools.lru_cache(maxsize=8)
    def _tables(self, latent_shape, bsub=1):
        sched = pk.build_pallas_schedule(latent_shape)
        ap, acm, _ = pk.batched_layouts(sched, bsub)
        return (jnp.asarray(sched.table), jnp.asarray(ap),
                jnp.asarray(acm)), sched

    @functools.lru_cache(maxsize=8)
    def _prep_fns(self, latent_shape, b_out, bsub=1):
        """Device pre/post-processing for a kernel taking b_out instances of
        bsub images each. Teacher symbols / outputs travel in the kernel's
        chunk-major layout (lane si * bsub * R + i * R + r of step t)."""
        sched = pk.build_pallas_schedule(latent_shape)
        _, _, icm = pk.batched_layouts(sched, bsub)
        idx = jnp.asarray(icm.reshape(-1))                # (T_pad * CQB,)
        n = int(np.prod(latent_shape))
        ng = bsub * n
        T, CQB = icm.shape[0], icm.shape[1]
        active = jnp.asarray(icm[None] < ng)              # (1, T, CQB)
        wrows = pk.kernel_stream_rows(sched, bsub)

        @jax.jit
        def pack_true(symbols_flat):
            # (b_out, bsub*n) int -> (b_out, T, 1, CQB) i32 teacher symbols
            padded = jnp.concatenate(
                [symbols_flat.astype(jnp.int32),
                 jnp.zeros((b_out, 1), jnp.int32)], axis=1)
            out = jnp.take(padded, idx, axis=1)
            return out.reshape(b_out, T, 1, CQB)

        # Inverse permutation: group-volume j -> its (step, lane) source
        # (a gather at decode time instead of a scatter — cheaper on TPU).
        flat_np = np.asarray(icm.reshape(-1))
        inv_np = np.zeros(ng, np.int32)
        valid_np = flat_np < ng
        inv_np[flat_np[valid_np]] = np.nonzero(valid_np)[0].astype(np.int32)
        inv_idx = jnp.asarray(inv_np)

        @jax.jit
        def unpack_syms(sym_tp):
            # (b_out, T, 1, CQB) i32 -> (b_out, bsub*n) int8 volumes (int8
            # keeps the host-link transfer at 1 byte/symbol; L <= 127)
            flat = sym_tp.reshape(b_out, T * CQB)
            return jnp.take(flat, inv_idx, axis=1).astype(jnp.int8)

        @functools.partial(jax.jit, static_argnames=('nbucket',))
        def pad_stream(words_bucket, nbucket):
            # (b_out, bsub, nbucket) real words (uint16 on the wire: rANS
            # renorm words are 16-bit) -> (b_out, bsub*wrows, 128) buffer.
            full = jnp.zeros((b_out, bsub, wrows * 128), jnp.uint32)
            full = full.at[:, :, :nbucket].set(
                words_bucket.astype(jnp.uint32))
            return full.reshape(b_out, bsub * wrows, 128)

        from . import codec as codec_lib
        wts_img = jnp.asarray(codec_lib.crc_weights(n))

        @jax.jit
        def checksum_syms(symbols_flat):
            # (b_out, bsub*n) or (bl, n) int -> (bl,) uint32 per-image crc
            v = symbols_flat.reshape(b_out * bsub, n)
            return codec_lib.symbol_crc_device(v.astype(jnp.uint32), wts_img)

        @jax.jit
        def theoretical_bits(freq_sel):
            # -> (b_out * bsub,) bits per image (group-major order).
            f = jnp.maximum(freq_sel.reshape(b_out, T, CQB)
                            .astype(jnp.float32), 1.0)
            bits = jnp.where(active, -jnp.log2(f / rans.SCALE), 0.0)
            per_img = jnp.sum(
                bits[:, :, :sched.S * bsub * pk.R]
                .reshape(b_out, T, sched.S, bsub, pk.R), axis=(1, 2, 4))
            return per_img.reshape(b_out * bsub)

        return (pack_true, unpack_syms, theoretical_bits, pad_stream,
                checksum_syms)

    def _weights(self, pc_params, centers):
        """Device-side weight folding + pad constants (tiny, jitted)."""
        return _fold_weights(self.pc, self.pc_config, self.kf, self.L,
                             pc_params, jnp.asarray(centers))

    @staticmethod
    def _pick_bsub(bl: int, prec: str) -> int:
        """Images per kernel instance: the largest power of two dividing
        the per-device batch, up to the precision's ring-VMEM cap (the
        whole per-step issue-bound chain is shared by bsub images — the
        round-3/4 throughput lever)."""
        import os
        forced = os.environ.get('IMGCOMP_PALLAS_BSUB')
        if forced:
            return int(forced)
        for d in (8, 4, 2):
            if d <= _PREC_BSUB_CAP[prec] and bl % d == 0:
                return d
        return 1

    def _encode_prec(self, b: int) -> str:
        """Encode-side ring-precision policy: bf16 rings whenever the
        GLOBAL batch is even (+0.06% measured bpp), f32 otherwise (the
        theory==loss oracle path at 1e-5). Within one precision, streams
        are bitwise identical across bsub, batch size, and device count
        — tested; across precisions they are mutually undecodable (the
        container prec byte routes decode). IMGCOMP_PALLAS_PREC=
        f32|bf16|f8 overrides.

        'f8' (e4m3 inner rings, bsub up to 8, +0.18% bpp) is opt-in, NOT
        the default: on the v5e the per-tap f8->f32 converts cost ~2x
        the whole step (8-bit (32,128) tiling forces lane/sublane
        shuffles on every ring read) — measured 12.4/10.5 vs bf16's
        6.0/4.0 us/step/img enc/dec at bsub=4, and bsub=8 f8 lands at
        11.6/9.8. Kept (correct, bit-exact, tested) for hardware where
        8-bit relayouts are cheap."""
        import os
        forced = os.environ.get('IMGCOMP_PALLAS_PREC')
        if forced:
            assert forced in _PREC_ID, forced
            return forced
        return 'bf16' if b % 2 == 0 else 'f32'

    @functools.lru_cache(maxsize=16)
    def _kernels(self, latent_shape, b, prec, bsub_max=None):
        # One jitted device function per direction. Packing/padding and the
        # pallas call MUST live in the same jit: the pack gather / pad
        # scatter produce non-default XLA layouts, and a pallas kernel
        # compiled against such an input layout loses pipelined DMA
        # (measured 26 us/step vs 0.05 on an empty kernel). Inside one jit,
        # the custom call's layout constraints make XLA insert a fast
        # relayout copy instead. Encode and decode are separate jits but
        # contain the IDENTICAL Mosaic kernel (same traced kernel function
        # and shapes), preserving encode==decode float determinism.
        # With a mesh, the kernel is built at the per-device batch size and
        # spans devices via shard_map (per-image math is batch-index free,
        # so results are bitwise identical at any device count). prec
        # selects the activation-ring precision ('f32'/'bf16'/'f8',
        # container prec byte 0/1/2): numerics are identical across batch
        # sizes and bsub within one precision, but streams of different
        # precisions are mutually undecodable.
        if isinstance(prec, bool):         # legacy ring16 bool (probes)
            prec = 'bf16' if prec else 'f32'
        interp = _use_interpret()
        ndev = 1 if self.mesh is None else int(self.mesh.devices.size)
        assert b % ndev == 0, \
            f'batch {b} must divide the {ndev}-device mesh evenly'
        bl = b // ndev
        bsub = self._pick_bsub(bl, prec)
        if bsub_max is not None:
            bsub = min(bsub, bsub_max)
        assert bl % bsub == 0, (bl, bsub)
        b_out = bl // bsub
        # XLA's scoped-VMEM accounting grows both with the pallas grid
        # batch (a b_out=8 Kodak kernel overflows the 16 MB limit by
        # ~1.5 MB where b_out=4 fits) and with the number of coexisting
        # pallas instances in one executable (4 unrolled 4-group
        # instances overflow identically). Large batches therefore run
        # the 4-group kernel under jax.lax.map — ONE pallas instance in
        # the graph, iterated by a loop, still a single device dispatch
        # (the ~10 ms remote-dispatch overhead amortizes over the whole
        # batch).
        bi = next(d for d in (4, 2, 1) if b_out % d == 0)
        # Schedule only — building the shared pallas_call closure here
        # would occupy an lru_cache slot for a kernel no fast path uses.
        sched = pk.build_pallas_schedule(latent_shape)
        # Encode uses the chunk-parallel teacher-forced variant (no
        # sequential rANS simulation, no decoded-symbol output, no stream
        # VMEM block); decode uses the dec_only variant (no freq/cdf table
        # outputs, no teacher-symbol input). Each variant's per-symbol
        # math is the identical traced program as the shared executable's
        # — stream/volume byte-identity is TPU-verified and CPU-pinned.
        # IMGCOMP_PALLAS_ENCPAR=0 / IMGCOMP_PALLAS_DECSPLIT=0 fall back to
        # the shared (mode-flag) executable; the shared kernel is only
        # built (and compiled) when a fallback asks for it.
        import os as _os
        encpar = _os.environ.get('IMGCOMP_PALLAS_ENCPAR', '1') != '0'
        decsplit = _os.environ.get('IMGCOMP_PALLAS_DECSPLIT', '1') != '0'
        if encpar:
            fwd_enc, _ = pk.make_forward(latent_shape, self.kf, self.L,
                                         bi, bsub=bsub, prec=prec,
                                         enc_parallel=True,
                                         interpret=interp)
        else:
            fwd_enc, _ = pk.make_forward(latent_shape, self.kf, self.L, bi,
                                         bsub=bsub, prec=prec,
                                         interpret=interp)
        if decsplit:
            fwd_dec, _ = pk.make_forward(latent_shape, self.kf, self.L,
                                         bi, bsub=bsub, prec=prec,
                                         dec_only=True, interpret=interp)
        else:
            fwd_dec, _ = pk.make_forward(latent_shape, self.kf, self.L, bi,
                                         bsub=bsub, prec=prec,
                                         interpret=interp)
        tables, _ = self._tables(latent_shape, bsub)
        # Per-lane active totals (identical for every image slot of the
        # interleave): the base of the v8 tail-packing pull threshold.
        acm_np = np.asarray(tables[2])[:, 0, :]          # (T_pad, CQB)
        BRl = bsub * pk.R
        tot_cols = acm_np.reshape(acm_np.shape[0], -1, BRl).sum(axis=(0, 1))
        lane_totals = tot_cols[:pk.R].astype(np.int32)
        for i in range(1, bsub):
            assert (tot_cols[i * pk.R:(i + 1) * pk.R]
                    == lane_totals).all(), 'image slots differ in schedule'
        from . import codec as _codec_lib
        x0_enc = _codec_lib._rans_x0()
        if int(lane_totals.max()) < _codec_lib.TAIL_MIN_LANE_SYMBOLS:
            x0_enc = rans.RANS_L

        def _rev(x0):
            return pk.make_reverse(latent_shape, bi, bsub=bsub,
                                   interpret=interp, x0=x0)[0]
        (pack_true, unpack_syms, theoretical_bits, pad_stream,
         checksum_syms) = self._prep_fns(latent_shape, b_out, bsub)
        wrows = pk.kernel_stream_rows(sched, bsub)
        n = int(np.prod(latent_shape))

        def encode_local(rneed, x0, pc_params, centers, symbols_flat):
            # symbols_flat: (bl, n) -> groups of bsub consecutive images.
            weights = _fold_weights(self.pc, self.pc_config, self.kf, self.L,
                                    pc_params, centers)
            true_syms = pack_true(symbols_flat.reshape(b_out, bsub * n))
            # The stream buffer and init states are step-math constants at
            # encode (zeros / RANS_L for every group), so they are closed
            # over, not mapped; the split encode kernel only touches a
            # (1, 1, 128) dummy stream block.
            streams0 = (jnp.zeros((1, 1, 128), jnp.uint32) if encpar else
                        jnp.zeros((bi, bsub * wrows, 128), jnp.uint32))
            states0 = jnp.full((bi, 1, bsub * pk.R), rans.RANS_L,
                               jnp.uint32)
            mode1 = jnp.ones((1,), jnp.int32)

            rev = _rev(x0)

            def enc_group(ts):
                _, fsel, ssel = fwd_enc(weights, tables, ts, streams0,
                                        states0, mode1)
                w, nw, st, kw = rev(tables, fsel, ssel)
                return w, nw, st, kw, fsel

            if b_out == bi:
                words, n_words, st, kwarm, fsel = enc_group(true_syms)
            else:
                nch = b_out // bi
                stacked = true_syms.reshape((nch, bi) + true_syms.shape[1:])
                w, nw, st, kw, fsel = jax.lax.map(enc_group, stacked)
                words = w.reshape((b_out,) + w.shape[2:])
                n_words = nw.reshape((b_out,) + nw.shape[2:])
                st = st.reshape((b_out,) + st.shape[2:])
                kwarm = kw.reshape((b_out,) + kw.shape[2:])
                fsel = fsel.reshape((b_out,) + fsel.shape[2:])
            outs = (words, n_words, st, kwarm, theoretical_bits(fsel),
                    checksum_syms(symbols_flat))
            if not rneed:
                return outs
            # Fused row-selection gather (the predicted-rneed fast path):
            # every device call costs ~10 ms of remote-dispatch overhead
            # on the axon link, so the gather rides the encode dispatch
            # instead of being its own.
            row_idx = jnp.asarray(np.concatenate(
                [np.arange(i * wrows, i * wrows + rneed)
                 for i in range(bsub)]))
            sel = jnp.take(words, row_idx, axis=1).astype(jnp.uint16)
            return outs + (sel,)

        encode_cache = {}

        def encode_dev(pc_params, centers, symbols_flat, rneed=0, x0=None):
            x0 = x0_enc if x0 is None else x0
            key = (rneed, x0)
            if key not in encode_cache:
                encode_cache[key] = self._shard_wrap(
                    functools.partial(encode_local, rneed, x0),
                    n_in_batch=1, n_out=6 + (1 if rneed else 0))
            return encode_cache[key](pc_params, centers, symbols_flat)

        def decode_local(nbucket, pc_params, centers, words_bucket, states,
                         thresh):
            # words_bucket: (bl, nbucket); states/thresh: (bl, 1, R) per
            # image; thresh = lane_totals - k (tail packing) or huge.
            weights = _fold_weights(self.pc, self.pc_config, self.kf, self.L,
                                    pc_params, centers)
            streams = pad_stream(words_bucket.reshape(b_out, bsub, -1),
                                 nbucket)
            st = states.reshape(b_out, 1, bsub * pk.R)
            th = thresh.reshape(b_out, 1, bsub * pk.R)
            cqb = pk._round_up(sched.S * bsub * pk.R, 128)
            # The dec_only kernel has no teacher input — a (1, 1, 1, 128)
            # dummy replaces the (b_out, T_pad, 1, CQB) zeros volume the
            # shared kernel needs (which is a group-constant either way,
            # so it is closed over, never mapped).
            dummy_true = (jnp.zeros((1, 1, 1, 128), jnp.int32) if decsplit
                          else jnp.zeros((bi, sched.table.shape[0], 1, cqb),
                                         jnp.int32))
            mode0 = jnp.zeros((1,), jnp.int32)

            def dec_group(args):
                sb, st0, th0 = args
                sy, _, _ = fwd_dec(weights, tables, dummy_true, sb, st0,
                                   mode0, thresh=th0)
                return sy

            if b_out == bi:
                syms = dec_group((streams, st, th))
            else:
                nch = b_out // bi
                stacked = (
                    streams.reshape((nch, bi) + streams.shape[1:]),
                    st.reshape((nch, bi) + st.shape[1:]),
                    th.reshape((nch, bi) + th.shape[1:]))
                sy = jax.lax.map(dec_group, stacked)
                syms = sy.reshape((b_out,) + sy.shape[2:])
            out = unpack_syms(syms)
            return out.reshape(bl, n), checksum_syms(out)

        decode_cache = {}

        def decode_dev(pc_params, centers, words_bucket, states, thresh,
                       nbucket):
            if nbucket not in decode_cache:
                decode_cache[nbucket] = self._shard_wrap(
                    functools.partial(decode_local, nbucket),
                    n_in_batch=3, n_out=2)
            return decode_cache[nbucket](pc_params, centers, words_bucket,
                                         states, thresh)

        return _KernelSet(encode_dev, decode_dev, sched, bsub, b_out, wrows,
                          lane_totals, x0_enc)

    # -- encode ---------------------------------------------------------------

    @functools.lru_cache(maxsize=32)
    def _take_fn(self, wrows, bsub, rneed):
        """One-dispatch row-selection gather: (b_out, bsub*wrows, 128)
        uint32 stream buffer -> the first `rneed` rows of every image's
        segment, as uint16 wire words (rANS renorm words are 16-bit)."""
        row_idx = jnp.asarray(np.concatenate(
            [np.arange(i * wrows, i * wrows + rneed)
             for i in range(bsub)]))

        @jax.jit
        def take(words):
            return jnp.take(words, row_idx, axis=1).astype(jnp.uint16)

        return take

    def encode_batch_submit(self, pc_params, symbols, centers):
        """symbols: (B, C, H, W) int — numpy OR a device array. Device
        symbols never cross the host link: the container checksum is
        computed on device (codec.symbol_crc_device).

        The stream-row selection gather is FUSED into the encode dispatch
        with a row count predicted from the previous batch (finish()
        falls back to an exact re-gather on underprediction). Dispatching
        it at finish time would queue it behind whatever large kernel the
        caller's pipeline submitted in between — measured 170 ms/batch of
        hidden queue wait on the remote-dispatch link at Kodak B=16 — and
        even as its own submit-time dispatch it costs ~10 ms of per-call
        remote overhead, so it rides the encode call itself."""
        host_symbols = None
        if not isinstance(symbols, jax.Array):
            host_symbols = np.asarray(symbols)
            symbols = jnp.asarray(host_symbols)
        b = symbols.shape[0]
        latent_shape = tuple(int(d) for d in symbols.shape[1:])
        prec = self._encode_prec(b)
        ks = self._kernels(latent_shape, b, prec)
        pred = self._rneed_pred.get((latent_shape, ks.wrows, ks.bsub), 0)
        outs = ks.encode_dev(pc_params, jnp.asarray(centers),
                             symbols.reshape(b, -1), rneed=pred)
        if pred:
            (words, n_words, states, kwarm, theo, crcs, presel) = outs
        else:
            words, n_words, states, kwarm, theo, crcs = outs
            presel = None
        # Early D2H: start streaming the scalars and the predicted stream
        # rows down at submit time so the finish-time fetch finds them on
        # host — on the remote link a blocking device_get serializes the
        # transfer behind whatever the caller dispatched in between
        # (mirrors planar_codec._submit_with).
        for a in (theo, n_words, states, kwarm, crcs, presel):
            if a is not None and hasattr(a, 'copy_to_host_async'):
                a.copy_to_host_async()
        return (latent_shape, host_symbols, b, words, n_words, states, kwarm,
                theo, crcs, prec, ks, pc_params, centers, symbols, presel,
                pred, ks.x0_enc)

    def encode_batch_finish(self, handle):
        from . import codec as codec_lib
        (latent_shape, host_symbols, b, words, n_words, states, kwarm, theo,
         crcs, prec, ks, pc_params, centers, symbols, presel, pred,
         x0_used) = handle
        # ONE fetch for the scalars AND the predicted stream rows (two
        # sequential device_gets cost two round trips on the remote link).
        fetched = jax.device_get(
            (theo, n_words, states, kwarm, crcs) +
            (() if presel is None else (presel,)))
        theo, n_words, states, kwarm, crcs = fetched[:5]
        presel_h = fetched[5] if presel is not None else None
        crcs = np.asarray(crcs).reshape(b)
        n_words = np.asarray(n_words).reshape(b)        # group-major == image
        states = np.asarray(states).reshape(b, pk.R)
        kwarm = np.asarray(kwarm).reshape(b, pk.R)
        tail = x0_used < rans.RANS_L
        if tail and kwarm.size and int(kwarm.max()) > codec_lib.K_CAP:
            # Pathological: some lane needs > K_CAP warmup symbols to reach
            # RANS_L. Re-encode the whole batch with the classic seed.
            print('*** pallas encode: warmup exceeded K_CAP; re-encoding '
                  'with x0=RANS_L')
            words, n_words, states, kwarm, theo, crcs = ks.encode_dev(
                pc_params, jnp.asarray(centers), symbols.reshape(b, -1),
                x0=rans.RANS_L)
            return self.encode_batch_finish(
                (latent_shape, host_symbols, b, words, n_words, states,
                 kwarm, theo, crcs, prec, ks, pc_params, centers, symbols,
                 None, 0, rans.RANS_L))
        cap = ks.wrows * 128
        if n_words.size and int(n_words.max()) > cap:
            # The bsub>=2 kernel holds a reduced (bpp-8 worst case) stream
            # buffer to fit VMEM; a pathologically long stream overflows it
            # (the rows written past the cap were clamped away). Re-encode
            # through the full-capacity bsub=1 kernel of the SAME ring
            # precision — within one precision, streams are bitwise
            # identical across bsub, so decodability is unaffected.
            if ks.bsub > 1:
                print(f'*** pallas encode: stream exceeded the bsub={ks.bsub} '
                      f'word cap ({cap}); re-encoding with the full-capacity '
                      'bsub=1 kernel')
                ks1 = self._kernels(latent_shape, b, prec, bsub_max=1)
                words, n_words, states, kwarm, theo, crcs = ks1.encode_dev(
                    pc_params, jnp.asarray(centers), symbols.reshape(b, -1))
                return self.encode_batch_finish(
                    (latent_shape, host_symbols, b, words, n_words, states,
                     kwarm, theo, crcs, prec, ks1, pc_params, centers,
                     symbols, None, 0, ks1.x0_enc))
            raise ValueError(
                f'stream exceeded the kernel word cap ({cap}) even at '
                'bsub=1 — the symbol volume is pathologically incompressible')
        # words: (b_out, bsub*wrows, 128) -> per-image rows; only the rows
        # that can hold real words cross the (slow) host link, as 16-bit
        # wire words (rANS renorm words are 16-bit: halves the transfer).
        wmax = int(n_words.max()) if n_words.size else 0
        rneed_act = min(ks.wrows, max(1, -(-wmax // 128) + 1))
        if presel_h is not None and pred >= rneed_act:
            sel_h, rneed = presel_h, pred   # pre-dispatched at submit time
        else:
            rneed = rneed_act
            sel_h = jax.device_get(
                self._take_fn(ks.wrows, ks.bsub, rneed)(words))
        # Predict the next batch's rows: actual need + 2 rows of headroom,
        # rounded up (few distinct gather executables, fewer mispredicts).
        self._rneed_pred[(latent_shape, ks.wrows, ks.bsub)] = min(
            ks.wrows, pk._round_up(rneed_act + 2, 4))
        host_words = np.asarray(sel_h).reshape(
            b, rneed * 128).astype(np.uint32)
        prec_id = _PREC_ID[prec]
        results = []
        for i in range(b):
            stream = host_words[i, :n_words[i]][::-1].astype(np.uint32)
            bitstream = codec_lib.serialize_stream(
                latent_shape, stream, states[i], int(crcs[i]),
                impl_id=codec_lib.IMPL_PALLAS, prec=prec_id,
                k=kwarm[i] if tail else None)
            results.append(codec_lib.EncodeResult(
                bitstream=bitstream, num_bits=len(bitstream) * 8,
                theoretical_bits=float(theo[i]),
                symbols=None if host_symbols is None else host_symbols[i]))
        return tuple(results)

    def encode_batch(self, pc_params, symbols, centers):
        return self.encode_batch_finish(
            self.encode_batch_submit(pc_params, symbols, centers))

    # -- decode ---------------------------------------------------------------

    def decode_batch_submit(self, pc_params, bitstreams, centers):
        from . import codec as codec_lib
        parsed = [codec_lib.deserialize_stream(bs) for bs in bitstreams]
        precs = {codec_lib.stream_prec(bs) for bs in bitstreams}
        assert len(precs) == 1, f'mixed stream precisions {precs}'
        pid = precs.pop()
        assert pid in _PREC_FROM_ID, f'unknown stream precision byte {pid}'
        prec = _PREC_FROM_ID[pid]
        latent_shape = parsed[0][0]
        assert all(p[0] == latent_shape for p in parsed), 'mixed shapes'
        b = len(parsed)
        ks = self._kernels(latent_shape, b, prec)
        cap = ks.wrows * 128
        nmax = max([1] + [len(p_[1]) for p_ in parsed])
        if nmax > cap and ks.bsub > 1:
            # Stream longer than the reduced bsub>=2 buffer (e.g. encoded
            # through the full-capacity bsub=1 kernel): decode through
            # bsub=1 of the same precision — bitwise-identical math.
            ks = self._kernels(latent_shape, b, prec, bsub_max=1)
            cap = ks.wrows * 128
        if nmax > cap:
            raise ValueError(
                f'stream length {nmax} exceeds the kernel word cap {cap}')
        # Upload-bucket granularity: coarse buckets mean few distinct
        # decode executables (each nbucket is its own jit/pallas compile);
        # fine buckets shave host->device stream-upload bytes on slow
        # links. 4096 words (8 KB/image) keeps recompiles rare.
        import os
        raw = os.environ.get('IMGCOMP_PALLAS_NBUCKET_GRAN', '4096')
        try:
            gran = max(128, int(raw))
        except ValueError:
            raise ValueError(
                f'IMGCOMP_PALLAS_NBUCKET_GRAN={raw!r} is not an integer')
        nbucket = min(pk._round_up(nmax, gran), cap)
        packed = np.zeros((b, nbucket), np.uint16)
        states = np.zeros((b, 1, pk.R), np.uint32)
        thresh = np.full((b, 1, pk.R), np.iinfo(np.int32).max // 2, np.int32)
        for i, (_, stream_words, st, _crc, k) in enumerate(parsed):
            assert len(st) == pk.R, (len(st), pk.R)
            states[i, 0, :] = st
            packed[i, :len(stream_words)] = stream_words
            if k is not None:    # tail-packed: no pull in the lane's last k
                thresh[i, 0, :] = ks.lane_totals - k.astype(np.int32)
        syms, crcs = ks.decode_dev(pc_params, jnp.asarray(centers),
                                   jnp.asarray(packed), jnp.asarray(states),
                                   jnp.asarray(thresh), nbucket=nbucket)
        if hasattr(crcs, 'copy_to_host_async'):
            crcs.copy_to_host_async()   # stream the CRCs down early
        return (latent_shape, parsed, syms, crcs)

    def decode_batch_finish(self, handle, verify: bool = True,
                            device_out: bool = False):
        """device_out=True returns the decoded volumes as a DEVICE int8
        array (B, C, H, W) — integrity is still verified via the
        device-computed checksums (only b uint32 scalars cross the link)."""
        latent_shape, parsed, packed_syms, crcs = handle
        b = len(parsed)
        if verify:
            crcs_h = np.asarray(jax.device_get(crcs)).reshape(b)
            for i in range(b):
                if int(crcs_h[i]) != parsed[i][3]:
                    raise ValueError(
                        f'decode CRC mismatch for image {i}: corrupt stream, '
                        'or decode ran with a different executable than '
                        'encode')
        if device_out:
            return packed_syms.reshape((b,) + latent_shape)
        out = np.asarray(jax.device_get(packed_syms), np.int32)
        return out.reshape((b,) + latent_shape)

    def decode_batch(self, pc_params, bitstreams, centers, verify=True,
                     device_out=False):
        return self.decode_batch_finish(
            self.decode_batch_submit(pc_params, bitstreams, centers),
            verify=verify, device_out=device_out)


class _KernelSet:
    def __init__(self, encode_dev, decode_dev, sched, bsub, b_out, wrows,
                 lane_totals, x0_enc):
        self.encode_dev = encode_dev
        self.decode_dev = decode_dev
        self.sched = sched
        self.bsub = bsub
        self.b_out = b_out
        self.wrows = wrows
        self.lane_totals = lane_totals   # (R,) active symbols per rANS lane
        self.x0_enc = x0_enc             # encoder seed (1 = tail packing)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _fold_weights(pc, pc_config, kf, L, pc_params, centers):
    """Folded weight pack for the kernel: ONLY the unmasked taps (the
    kernel's X fill and dots use the packed layout — dropping the
    exact-zero masked-tap rows leaves every MXU partial sum bit-identical
    while shrinking the contraction ~25%), L1 expanded to the
    Q_CH-replicated input layout, per-layer all-pad activation constants."""
    from .cached import _layer_weights
    (w1, b1), (w2, b2), (w3, b3), (w4, b4) = _layer_weights(pc_params, kf, L)
    pad_value = pc_lib.auto_pad_value(pc_config, centers, pc_params)
    sel1 = np.asarray(pk._unmasked_taps(first=True))
    selo = np.asarray(pk._unmasked_taps(first=False))
    t1, to = len(sel1), len(selo)
    w2 = w2.reshape(18, kf, kf)[selo].reshape(to * kf, kf)
    w3 = w3.reshape(18, kf, kf)[selo].reshape(to * kf, kf)
    w4 = w4.reshape(18, kf, L)[selo].reshape(to * kf, L)
    # L1 expansion: input ring carries Q_CH identical lanes; only lane 0
    # of each tap group carries the weight.
    w1e = jnp.zeros((t1, pk.Q_CH, kf), jnp.float32).at[:, 0, :].set(
        w1.reshape(18, kf)[sel1]).reshape(t1 * pk.Q_CH, kf)
    # All-pad activation constants seed the rings (shared with the XLA
    # ring impl, coding/ring.py: the two impls must agree on pad
    # semantics). Channel vectors become sublane-major (ch, 1) to match
    # the transposed (channels, cells) plane layout of the kernel.
    from .ring import _pad_constants
    k1c, k2c, k3c = _pad_constants(pc, pc_params, pad_value)
    k1, k2, k3 = k1c[:, None], k2c[:, None], k3c[:, None]
    return (jnp.full((1,), pad_value, jnp.float32), w1e, b1[:, None],
            w2, b2[:, None], w3, b3[:, None], w4, b4[:, None],
            k1, k2, k3, centers[:, None])
