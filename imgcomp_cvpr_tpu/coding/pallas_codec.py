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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import probclass as pc_lib
from . import pallas_kernel as pk
from . import rans


def _use_interpret() -> bool:
    return jax.default_backend() != 'tpu'


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

    def _shard_wrap(self, fn, n_in_batch, n_out):
        """shard_map fn over the data axis: first args replicated params/
        centers, last n_in_batch args batch-sharded; all outputs sharded."""
        if self.mesh is None:
            return jax.jit(fn)
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        from ..parallel import mesh as mesh_lib
        d = P(mesh_lib.DATA_AXIS)
        in_specs = (P(), P()) + (d,) * n_in_batch
        return jax.jit(shard_map(
            fn, mesh=self.mesh, in_specs=in_specs,
            out_specs=(d,) * n_out if n_out > 1 else d,
            check_rep=False))

    # -- per-shape cached device constants -----------------------------------

    @functools.lru_cache(maxsize=8)
    def _tables(self, latent_shape):
        sched = pk.build_pallas_schedule(latent_shape)
        return (jnp.asarray(sched.table), jnp.asarray(sched.active)), sched

    @functools.lru_cache(maxsize=8)
    def _prep_fns(self, latent_shape, b):
        sched = pk.build_pallas_schedule(latent_shape)
        idx = jnp.asarray(sched.idx_map.reshape(-1))      # (T_pad * P_pad,)
        n = int(np.prod(latent_shape))
        T, P_pad = sched.idx_map.shape[0], sched.P_pad    # padded step count
        active = jnp.asarray(sched.active[None, :, 0, :] != 0)  # (1, T, P_pad)

        @jax.jit
        def pack_true(symbols_flat):
            # (B, n) int -> (B, T, 1, P_pad) i32 teacher symbols
            padded = jnp.concatenate(
                [symbols_flat.astype(jnp.int32),
                 jnp.zeros((b, 1), jnp.int32)], axis=1)
            out = jnp.take(padded, idx, axis=1)
            return out.reshape(b, T, 1, P_pad)

        # Inverse permutation: latent j -> its (step, lane) source position
        # (a gather at decode time instead of a scatter — cheaper on TPU).
        flat_np = np.asarray(sched.idx_map.reshape(-1))
        inv_np = np.zeros(n, np.int32)
        valid_np = flat_np < n
        inv_np[flat_np[valid_np]] = np.nonzero(valid_np)[0].astype(np.int32)
        inv_idx = jnp.asarray(inv_np)

        @jax.jit
        def unpack_syms(sym_tp):
            # (B, T, 1, P_pad) i32 -> (B, n) int8 latent volumes (int8 keeps
            # the host-link transfer at 1 byte/symbol; L <= 127 always)
            flat = sym_tp.reshape(b, T * P_pad)
            return jnp.take(flat, inv_idx, axis=1).astype(jnp.int8)

        @functools.partial(jax.jit, static_argnames=('nbucket',))
        def pad_stream(words_bucket, nbucket):
            # (B, nbucket) real words -> (B, wrows, 128) kernel buffer;
            # only the real words cross the host link.
            wrows = sched.wcap // 128 + 2
            full = jnp.zeros((b, wrows * 128), jnp.uint32)
            full = full.at[:, :nbucket].set(words_bucket)
            return full.reshape(b, wrows, 128)

        @jax.jit
        def theoretical_bits(freq_sel):
            f = jnp.maximum(freq_sel.reshape(b, T, P_pad).astype(jnp.float32),
                            1.0)
            bits = -jnp.log2(f / rans.SCALE)
            return jnp.sum(jnp.where(active, bits, 0.0), axis=(1, 2))

        return pack_true, unpack_syms, theoretical_bits, pad_stream

    def _weights(self, pc_params, centers):
        """Device-side weight folding + pad constants (tiny, jitted)."""
        return _fold_weights(self.pc, self.pc_config, self.kf, self.L,
                             pc_params, jnp.asarray(centers))

    @functools.lru_cache(maxsize=8)
    def _kernels(self, latent_shape, b):
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
        # span over devices via shard_map (per-image math is batch-index
        # free, so results are bitwise identical at any device count).
        interp = _use_interpret()
        ndev = 1 if self.mesh is None else int(self.mesh.devices.size)
        assert b % ndev == 0, \
            f'batch {b} must divide the {ndev}-device mesh evenly'
        bl = b // ndev
        fwd, sched = pk.make_forward(latent_shape, self.kf, self.L, bl,
                                     interpret=interp)
        rev, _ = pk.make_reverse(latent_shape, bl, interpret=interp)
        tables, _ = self._tables(latent_shape)
        pack_true, unpack_syms, theoretical_bits, pad_stream = self._prep_fns(
            latent_shape, bl)
        wrows = sched.wcap // 128 + 2

        def encode_local(pc_params, centers, symbols_flat):
            weights = _fold_weights(self.pc, self.pc_config, self.kf, self.L,
                                    pc_params, centers)
            true_syms = pack_true(symbols_flat)
            streams = jnp.zeros((bl, wrows, 128), jnp.uint32)
            states = jnp.full((bl, 1, pk.R), rans.RANS_L, jnp.uint32)
            _, fsel, ssel = fwd(weights, tables, true_syms, streams, states,
                                jnp.ones((1,), jnp.int32))
            words, n_words, st = rev(tables, fsel, ssel)
            return words, n_words, st, theoretical_bits(fsel)

        encode_dev = self._shard_wrap(encode_local, n_in_batch=1, n_out=4)

        def decode_local(nbucket, pc_params, centers, words_bucket, states):
            weights = _fold_weights(self.pc, self.pc_config, self.kf, self.L,
                                    pc_params, centers)
            streams = pad_stream(words_bucket, nbucket)
            dummy_true = jnp.zeros((bl, sched.idx_map.shape[0], 1,
                                    sched.P_pad), jnp.int32)
            syms, _, _ = fwd(weights, tables, dummy_true, streams, states,
                             jnp.zeros((1,), jnp.int32))
            return unpack_syms(syms)

        decode_cache = {}

        def decode_dev(pc_params, centers, words_bucket, states, nbucket):
            if nbucket not in decode_cache:
                decode_cache[nbucket] = self._shard_wrap(
                    functools.partial(decode_local, nbucket),
                    n_in_batch=2, n_out=1)
            return decode_cache[nbucket](pc_params, centers, words_bucket,
                                         states)

        return encode_dev, decode_dev, sched

    # -- encode ---------------------------------------------------------------

    def encode_batch_submit(self, pc_params, symbols: np.ndarray, centers):
        symbols = np.asarray(symbols)
        b = symbols.shape[0]
        latent_shape = tuple(symbols.shape[1:])
        encode_dev, _, sched = self._kernels(latent_shape, b)
        words, n_words, states, theo = encode_dev(
            pc_params, jnp.asarray(centers),
            jnp.asarray(symbols.reshape(b, -1)))
        return (latent_shape, symbols, words, n_words, states, theo)

    def encode_batch_finish(self, handle):
        from . import codec as codec_lib
        latent_shape, symbols, words, n_words, states, theo = handle
        b = symbols.shape[0]
        theo, n_words, states = jax.device_get((theo, n_words, states))
        n_words = np.asarray(n_words).reshape(b)
        states = np.asarray(states).reshape(b, pk.R)
        wmax = int(n_words.max()) if n_words.size else 0
        wrows = min(max(1, -(-wmax // 128)), int(words.shape[1]))
        host_words = np.asarray(jax.device_get(words[:, :wrows, :]))
        host_words = host_words.reshape(b, -1)
        results = []
        for i in range(b):
            stream = host_words[i, :n_words[i]][::-1].astype(np.uint32)
            bitstream = codec_lib.serialize_stream(
                latent_shape, stream, states[i],
                codec_lib.symbol_crc(symbols[i]), impl_id=codec_lib.IMPL_PALLAS)
            results.append(codec_lib.EncodeResult(
                bitstream=bitstream, num_bits=len(bitstream) * 8,
                theoretical_bits=float(theo[i]), symbols=symbols[i]))
        return tuple(results)

    def encode_batch(self, pc_params, symbols, centers):
        return self.encode_batch_finish(
            self.encode_batch_submit(pc_params, symbols, centers))

    # -- decode ---------------------------------------------------------------

    def decode_batch_submit(self, pc_params, bitstreams, centers):
        from . import codec as codec_lib
        parsed = [codec_lib.deserialize_stream(bs) for bs in bitstreams]
        latent_shape = parsed[0][0]
        assert all(p[0] == latent_shape for p in parsed), 'mixed shapes'
        b = len(parsed)
        _, decode_dev, sched = self._kernels(latent_shape, b)
        nmax = max([1] + [len(p_[1]) for p_ in parsed])
        nbucket = min(pk._round_up(nmax, 4096), (sched.wcap // 128 + 2) * 128)
        packed = np.zeros((b, nbucket), np.uint32)
        states = np.zeros((b, 1, pk.R), np.uint32)
        for i, (_, stream_words, st, _crc) in enumerate(parsed):
            assert len(st) == pk.R, (len(st), pk.R)
            states[i, 0, :] = st
            packed[i, :len(stream_words)] = stream_words
        syms = decode_dev(pc_params, jnp.asarray(centers),
                          jnp.asarray(packed), jnp.asarray(states),
                          nbucket=nbucket)
        return (latent_shape, parsed, syms)

    def decode_batch_finish(self, handle, verify: bool = True):
        from . import codec as codec_lib
        latent_shape, parsed, packed_syms = handle
        b = len(parsed)
        out = np.asarray(jax.device_get(packed_syms), np.int32)
        out = out.reshape((b,) + latent_shape)
        if verify:
            for i in range(b):
                if codec_lib.symbol_crc(out[i]) != parsed[i][3]:
                    raise ValueError(
                        f'decode CRC mismatch for image {i}: corrupt stream, '
                        'or decode ran with a different executable than encode')
        return out

    def decode_batch(self, pc_params, bitstreams, centers, verify=True):
        return self.decode_batch_finish(
            self.decode_batch_submit(pc_params, bitstreams, centers),
            verify=verify)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _fold_weights(pc, pc_config, kf, L, pc_params, centers):
    """Folded weight pack for the kernel: masked taps zeroed, L1 expanded to
    the Q_CH-replicated input layout, per-layer all-pad activation constants."""
    from .cached import _layer_weights
    (w1, b1), (w2, b2), (w3, b3), (w4, b4) = _layer_weights(pc_params, kf, L)
    pad_value = pc_lib.auto_pad_value(pc_config, centers, pc_params)
    # L1 expansion: input ring carries Q_CH identical lanes; only lane 0
    # of each tap group carries the weight.
    w1e = jnp.zeros((18, pk.Q_CH, kf), jnp.float32).at[:, 0, :].set(
        w1.reshape(18, kf)).reshape(18 * pk.Q_CH, kf)
    # All-pad activation constants seed the rings (a VALID conv of a
    # constant volume is constant; ref probclass.py:268-292 pad semantics).
    patch = jnp.full((1, 5, 11, 11), pad_value, jnp.float32)
    acts = pc.net.apply(pc_params, patch, return_activations=True)
    # Channel vectors are sublane-major (ch, 1) to match the transposed
    # (channels, cells) plane layout of the kernel.
    k1 = acts['l1'][0, 0, 0, 0][:, None]
    k2 = acts['l2'][0, 0, 0, 0][:, None]
    k3 = acts['l3'][0, 0, 0, 0][:, None]
    return (jnp.full((1,), pad_value, jnp.float32), w1e, b1[:, None],
            w2, b2[:, None], w3, b3[:, None], w4, b4[:, None],
            k1, k2, k3, centers[:, None])
