"""On-device autoregressive latent codec.

Replaces the reference's per-symbol sess.run + Python arithmetic coder
(ref: bit_counter.py:103-163, probclass.py:425-482, ~350s/Kodak image) with
a single jitted `lax.scan` over wavefront steps that runs entirely on TPU:

  per step: gather M causal context patches -> context-model logits
  (the same flax module as training) -> softmax -> integer CDFs ->
  vectorized rANS lane decode -> scatter decoded center values back into
  the working volume.

Bit-exactness strategy: float logits feed an integer CDF quantization, so
encode and decode MUST compute identical floats. They do, because both
run the *same compiled executable*: the scan takes a traced `mode` flag —
encode mode feeds the true symbols into the volume (teacher forcing) and
records each symbol's (freq, cdf_low); decode mode uses the rANS-decoded
symbol. The rANS math itself is pure integer arithmetic. The encoder then
runs the reverse interleaved-rANS pass over the recorded tables
(coding/rans.py) and serializes per-lane streams.

The bitstream format is *not* the reference's (block-parallel lanes vs one
sequential stream); parity is defined as symbol round-trip exactness +
coded size matching the theoretical cross-entropy (SURVEY.md §7 "hard
parts" #1).
"""

from __future__ import annotations

import functools
import io
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import probclass as pc_lib
from . import rans
from . import wavefront

MAGIC = b'\xa7'  # imgcomp-cvpr-tpu codec (1 byte: the container's fixed
                 # cost is a first-class metric — VERDICT r3 #4)
VERSION = 11  # v8 (x0=1 tail packing: no 16-bit seed flush per lane, the
              # per-lane warmup counts k ride the container and the
              # decoder suppresses its renorm pull for each lane's last k
              # symbols — see rans.scalar_encode) + v9 bit-packed side
              # info: the header shrinks 15 -> 12 bytes (4-bit version,
              # 3-bit impl, 12-bit shape fields with a wide escape), the
              # wide-mode state-length descriptors shrink 5 -> ~4.1 bits
              # (d=0 keeps hi=0 legal, d=15 borrows one bit for
              # ln in {15,16}), and the k-table stores kmin plus
              # span-width deltas. v10 entropy-codes the k-table: the
              # per-lane warmups are bell-shaped around their median
              # (measured, PERF.md), so a median-anchored zigzag Rice
              # code beats the flat span-width deltas (whose width a
              # single outlier lane sets for everyone) by ~1.5-2.5
              # bits/lane; a per-image scheme bit keeps the flat code as
              # the worst-case escape, so v10 is never larger than v9;
              # v10 also packs sub-256 shape dims in 8 bits (11-byte
              # header). v11 runs the state-hi bit-length DESCRIPTORS
              # through the same flat/Rice coder: on real streams the
              # final states cluster near 2**32 (descriptors 15-16), so
              # Rice around the median costs ~1.3 bits/lane vs v10's
              # ~4.1; a selector bit keeps the v10 per-lane descriptors
              # as the worst-case escape (and rawesc still bounds
              # everything at raw u32), so v11 never loses more than
              # that one bit. v8/v9/v10 archives still parse (frozen
              # branches below). Earlier versions are rejected cleanly
              # by the version check. The version field is 4 bits —
              # headroom to v15.

# Container impl ids: a stream must be decoded by the implementation that
# encoded it (bit-exactness holds per executable); the header makes decode
# auto-route instead of failing the CRC.
IMPL_DIRECT, IMPL_CACHED, IMPL_RING, IMPL_PALLAS, IMPL_PLANAR = 0, 1, 2, 3, 4
IMPL_IDS = {'direct': IMPL_DIRECT, 'cached': IMPL_CACHED, 'ring': IMPL_RING,
            'pallas': IMPL_PALLAS, 'planar': IMPL_PLANAR}
IMPL_NAMES = {v: k for k, v in IMPL_IDS.items()}


TAIL_MIN_LANE_SYMBOLS = 256   # auto tail packing only when lanes are
                              # long enough that the ~16-bit/lane seed
                              # saving dominates the k-table (tiny test
                              # latents would pay more for kw*r bits than
                              # their 1-2-symbol lanes can save)


def _rans_x0() -> int:
    """Encoder lane seed. '1' (default) = tail packing: no 16-bit seed
    flush per lane, warmup counts ride the container. 'L' = the classic
    x0=RANS_L seed (also the automatic per-image fallback when a warmup
    exceeds K_CAP)."""
    import os
    v = os.environ.get('IMGCOMP_RANS_X0', '1')
    x0 = rans.RANS_L if v in ('L', 'l') else int(v)
    if not 1 <= x0 <= rans.RANS_L:
        raise ValueError(
            f'IMGCOMP_RANS_X0={v!r}: the rANS lane seed must satisfy '
            f'1 <= x0 <= RANS_L ({rans.RANS_L}); x0=0 sticks at zero and '
            f'silently corrupts streams')
    return x0


# Symbol-volume checksum for the container: a weighted mod-2^32 sum chosen
# to be computable ON DEVICE (jnp uint32 wraparound twin below) so encode
# and decode never have to ship the symbol volume over the host link just
# to verify integrity. Detects random corruption with ~2^-32 miss rate
# (replaces the round-1 zlib.crc32, which is host-only).
_CK_MULT = np.uint64(2654435761)        # Knuth multiplicative hash constant
_CK_MASK = np.uint64(0xFFFFFFFF)


def symbol_crc(symbols: np.ndarray) -> int:
    x = np.ascontiguousarray(symbols, np.int8).reshape(-1)
    v = (x.astype(np.uint64) & np.uint64(0xFF)) + np.uint64(1)
    i = np.arange(v.size, dtype=np.uint64)
    w = ((i * _CK_MULT) & _CK_MASK) | np.uint64(1)
    s1 = int(v.sum() & _CK_MASK)
    s2 = int((((v * w) & _CK_MASK).sum()) & _CK_MASK)
    rot = ((s2 << 16) | (s2 >> 16)) & 0xFFFFFFFF
    return (s1 ^ rot) & 0xFFFFFFFF


def symbol_crc_device(symbols_flat_u32, weights_u32):
    """jnp twin of symbol_crc on a (..., n) int volume; weights_u32 =
    crc_weights(n). Returns (...,) uint32."""
    v = (symbols_flat_u32.astype(jnp.uint32) & jnp.uint32(0xFF)) + \
        jnp.uint32(1)
    s1 = jnp.sum(v, axis=-1, dtype=jnp.uint32)
    s2 = jnp.sum(v * weights_u32, axis=-1, dtype=jnp.uint32)
    rot = (s2 << 16) | (s2 >> 16)
    return s1 ^ rot


def crc_weights(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.uint64)
    return (((i * _CK_MULT) & _CK_MASK) | np.uint64(1)).astype(np.uint32)


class EncodeResult(NamedTuple):
    bitstream: bytes
    num_bits: int               # len(bitstream) * 8
    theoretical_bits: float     # sum of -log2(freq/SCALE) over all symbols
    symbols: np.ndarray         # what was encoded (C, H, W)


class LatentCodec:
    """Entropy codec for one (pc_config, num_centers) context model.

    impl='ring' (default) is the slab/ring-buffer activation-cached scan
    (coding/ring.py, no gathers in the hot loop); impl='cached' is the
    gather-based cached scan; impl='direct' recomputes full context patches
    per step (simplest; the cross-check implementation).
    Streams are only decodable by the implementation (and batch shape) that
    encoded them — the container CRC catches violations.
    """

    def __init__(self, pc: pc_lib.ProbClassifier, pc_config, impl: str = 'auto',
                 mesh=None):
        self.pc = pc
        self.pc_config = pc_config
        self.context_size = pc_lib.context_size(pc_config)
        assert impl in ('auto', 'direct', 'cached', 'ring', 'pallas',
                        'planar'), impl
        import jax
        on_tpu = jax.default_backend() == 'tpu'
        if impl == 'auto':
            # K=3: the Pallas 3D monolith on TPU, the XLA ring scan on CPU.
            # K!=3: the planar per-depth-plane Pallas codec on TPU (the
            # reference's default config is K=5, ref pc_configs/base:3);
            # 'direct' stays the CPU oracle.
            if pc_config.kernel_size == 3:
                impl = 'pallas' if on_tpu else 'ring'
            else:
                impl = 'planar' if on_tpu else 'direct'
        if impl in ('cached', 'ring', 'pallas') and pc_config.kernel_size != 3:
            impl = 'planar'  # K=3-specialized fast paths
        if impl == 'planar' and pc_config.kernel_size == 3:
            pass  # planar supports K=3 too (used for cross-checks)
        self.impl = impl
        # With a mesh, image batches shard over the data axis: the pallas
        # impl via shard_map (pallas_codec.py), the XLA impls via sharded
        # inputs + SPMD propagation through the vmapped scan.
        self.mesh = mesh
        self._pallas = None
        self._planar = None
        self._siblings = {}

    def _pallas_coder(self):
        if self._pallas is None:
            from .pallas_codec import PallasCoder
            self._pallas = PallasCoder(self.pc, self.pc_config, mesh=self.mesh)
        return self._pallas

    def _planar_coder(self):
        if self._planar is None:
            from .planar_codec import PlanarCoder
            self._planar = PlanarCoder(self.pc, self.pc_config,
                                       mesh=self.mesh)
        return self._planar

    def _shard(self, batch_arr):
        """Device-put a batch-major array with the batch dim sharded."""
        if self.mesh is None:
            return jnp.asarray(batch_arr)
        from ..parallel import mesh as mesh_lib
        return mesh_lib.shard_batch(np.asarray(batch_arr), self.mesh)

    def _route(self, impl_id: int) -> 'LatentCodec':
        """Return the codec matching a container's impl id (self-routing
        decode; streams are only decodable by the impl that encoded them)."""
        name = IMPL_NAMES[impl_id]
        if name == self.impl:
            return self
        if name not in self._siblings:
            self._siblings[name] = LatentCodec(self.pc, self.pc_config,
                                               impl=name, mesh=self.mesh)
        return self._siblings[name]

    # ------------------------------------------------------------------

    @functools.lru_cache(maxsize=8)
    def _scan_fn(self, latent_shape: Tuple[int, int, int]):
        if self.impl == 'cached':
            from . import cached
            return cached.CachedScanBuilder(self.pc, self.pc_config).make_run(
                latent_shape)
        if self.impl == 'ring':
            from . import ring
            return ring.RingScanBuilder(self.pc, self.pc_config).make_run(
                latent_shape)
        return self._direct_scan_fn(latent_shape)

    @functools.lru_cache(maxsize=8)
    def _direct_scan_fn(self, latent_shape: Tuple[int, int, int]):
        sched = wavefront.build_schedule(latent_shape, self.context_size)
        ctx_d = self.context_size // 2 + 1
        cs = self.context_size
        n_ctx = ctx_d * cs * cs
        flat_size = int(np.prod(sched.padded_shape))

        ctx_offsets = jnp.asarray(sched.ctx_offsets)
        xs = {
            'base': jnp.asarray(sched.base_flat),
            'scatter': jnp.asarray(sched.scatter_flat),
            'sym_idx': jnp.asarray(sched.sym_flat),
            'active': jnp.asarray(sched.active),
        }

        @jax.jit
        def run(pc_params, centers, true_syms_flat, stream, init_states, mode,
                thresh):
            """mode: 0 = decode, 1 = encode (teacher-forced). Same executable
            for both — that is the bit-exactness guarantee."""
            pad_value = pc_lib.auto_pad_value(self.pc_config, centers, pc_params)
            volume = jnp.full((flat_size,), pad_value, jnp.float32)

            def step(carry, x):
                volume, states, gptr, cnt = carry
                idx = x['base'][:, None] + ctx_offsets[None, :]      # (M, n_ctx)
                patches = jnp.take(volume, idx, axis=0)
                patches = patches.reshape(-1, ctx_d, cs, cs)
                logits = self.pc.logits_from_padded(pc_params, patches)  # (M,1,1,1,L)
                logits = logits.reshape(logits.shape[0], -1)
                probs = jax.nn.softmax(logits, axis=-1)
                freq, cdf_low = rans.quantize_cdf(probs)

                sym_dec, states, gptr, cnt = rans.decode_step_interleaved(
                    states, gptr, stream, freq, cdf_low, x['active'],
                    cnt, thresh)
                sym_true = jnp.take(true_syms_flat, x['sym_idx']).astype(jnp.int32)
                sym = jnp.where(mode == 1, sym_true, sym_dec)
                sym = jnp.where(x['active'], sym, 0)

                value = jnp.take(centers, sym)
                volume = volume.at[x['scatter']].set(
                    jnp.where(x['active'], value, 0.0), mode='drop')

                sel = sym[:, None].astype(jnp.int32)
                freq_sel = jnp.take_along_axis(freq, sel, axis=-1)[:, 0]
                start_sel = jnp.take_along_axis(cdf_low, sel, axis=-1)[:, 0]
                return (volume, states, gptr, cnt), (sym.astype(jnp.int8),
                                                     freq_sel, start_sel)

            init = (volume, init_states, jnp.zeros((), jnp.int32),
                    jnp.zeros_like(thresh))
            (_, _, final_gptr, _), ys = jax.lax.scan(step, init, xs)
            syms, freq_sel, start_sel = ys
            return syms, freq_sel, start_sel, final_gptr

        return run, sched

    @functools.lru_cache(maxsize=8)
    def _lane_totals(self, latent_shape: Tuple[int, int, int]) -> np.ndarray:
        """(r,) int32: active symbol slots per persistent rANS lane — the
        base for the tail-packing pull threshold (total - k)."""
        sched = self._scan_fn(latent_shape)[1]
        act = np.asarray(sched.active)
        T, M = act.shape
        r = rans.R_LANES if M >= rans.R_LANES else M
        return act.reshape(T, M // r, r).sum(axis=(0, 1)).astype(np.int32)

    @functools.lru_cache(maxsize=8)
    def _batched_scan_fn(self, latent_shape: Tuple[int, int, int]):
        """vmapped scan over a leading image-batch dim: one compiled scan
        decodes B images concurrently (B x M lanes per step), amortizing
        the per-step dispatch and filling the chip."""
        run, sched = self._scan_fn(latent_shape)
        batched = jax.jit(jax.vmap(run, in_axes=(None, None, 0, 0, 0, None, 0)))
        return batched, sched

    @functools.lru_cache(maxsize=8)
    def _device_helpers(self, latent_shape: Tuple[int, int, int]):
        """Device-side pre/post-processing around the scan, so only
        kilobytes cross the (slow) host<->device link: on-device reverse
        rANS encode, per-image theoretical-bit reduction, symbol packing,
        and stream padding."""
        sched = self._scan_fn(latent_shape)[1]
        active_c = jnp.asarray(sched.active)
        sym_flat_c = jnp.asarray(sched.sym_flat)
        n = int(np.prod(latent_shape))

        @functools.partial(jax.jit, static_argnames=('x0',))
        def encode_streams(freq_sel, start_sel, x0=rans.RANS_L):
            # (B, T, M) -> reversed word buffer + count + (R,) states + k
            return jax.vmap(
                lambda f, s: rans.encode_reverse_scan_interleaved(
                    f, s, active_c, x0=x0)
            )(freq_sel, start_sel)

        @jax.jit
        def theoretical_bits(freq_sel):
            bits = -jnp.log2(jnp.maximum(freq_sel.astype(jnp.float32), 1.0)
                             / rans.SCALE)
            return jnp.sum(jnp.where(active_c[None], bits, 0.0), axis=(1, 2))

        @jax.jit
        def pack_syms(syms):
            # (B, T, M) int8 -> (B, n) int8 latent volumes
            idx = jnp.where(active_c, sym_flat_c, n)
            def one(sy):
                return jnp.zeros((n,), jnp.int8).at[idx].set(sy, mode='drop')
            return jax.vmap(one)(syms)

        @functools.partial(jax.jit, static_argnames=('t',))
        def pad_streams(packed, t):
            b, wmax = packed.shape
            return jnp.zeros((b, t), jnp.uint32).at[:, :wmax].set(packed)

        return encode_streams, theoretical_bits, pack_syms, pad_streams

    # ------------------------------------------------------------------

    def _mesh_pad(self, b: int) -> int:
        """Images to append so the batch divides the mesh's device count
        (per-image results of the pad copies are dropped by finish)."""
        if self.mesh is None:
            return 0
        ndev = int(self.mesh.devices.size)
        return (ndev - b % ndev) % ndev

    def encode_batch_submit(self, pc_params, symbols: np.ndarray,
                            centers: np.ndarray):
        """Dispatch the device side of an encode without blocking: the CDF
        scan and the on-device reverse rANS. Returns an opaque handle for
        encode_batch_finish — letting callers overlap the host-side
        fetch/serialize of one batch with the device work of the next.
        Mesh batches that don't divide the device count are padded by
        repeating the last image (pad results dropped at finish)."""
        if not isinstance(symbols, (np.ndarray, jax.Array)):
            symbols = np.asarray(symbols)
        pad = self._mesh_pad(symbols.shape[0])
        if pad:
            n_real = symbols.shape[0]
            rep = (jnp.concatenate if isinstance(symbols, jax.Array)
                   else np.concatenate)
            symbols = rep([symbols] + [symbols[-1:]] * pad, axis=0)
            return ('meshpad', n_real,
                    self.encode_batch_submit(pc_params, symbols, centers))
        if self.impl == 'pallas':
            return ('pallas', self._pallas_coder().encode_batch_submit(
                pc_params, symbols, centers))
        if self.impl == 'planar':
            return ('planar', self._planar_coder().encode_batch_submit(
                pc_params, symbols, centers))
        symbols = np.asarray(symbols)
        b = symbols.shape[0]
        latent_shape = tuple(symbols.shape[1:])
        run, sched = self._batched_scan_fn(latent_shape)
        encode_streams, theoretical_bits, _, _ = self._device_helpers(latent_shape)
        r = rans.R_LANES if sched.M >= rans.R_LANES else sched.M
        w_buf = sched.T * sched.M
        streams_dummy = self._shard(np.zeros((b, w_buf), np.uint32))
        states_dummy = self._shard(np.full((b, r), rans.RANS_L, np.uint32))
        thresh_dummy = self._shard(
            np.full((b, r), np.iinfo(np.int32).max // 2, np.int32))
        _, freq_sel, start_sel, _ = run(
            pc_params, jnp.asarray(centers),
            self._shard(symbols.reshape(b, -1).astype(np.int8)),
            streams_dummy, states_dummy, jnp.int32(1), thresh_dummy)
        x0 = _rans_x0()
        if int(self._lane_totals(latent_shape).max()) < TAIL_MIN_LANE_SYMBOLS:
            x0 = rans.RANS_L
        buf, n_words, states, k = encode_streams(freq_sel, start_sel, x0=x0)
        theo = theoretical_bits(freq_sel)
        # sels are retained only for the rare k>K_CAP re-encode fallback,
        # which can't trigger under the classic seed — drop them there so
        # two (B,T,M) buffers aren't pinned across the pipelined window.
        sels = (freq_sel, start_sel) if x0 < rans.RANS_L else None
        return (latent_shape, symbols, buf, n_words, states, theo, k, x0,
                sels)

    def encode_batch_finish(self, handle) -> Tuple[EncodeResult, ...]:
        if isinstance(handle, tuple) and handle and handle[0] == 'meshpad':
            return self.encode_batch_finish(handle[2])[:handle[1]]
        if isinstance(handle, tuple) and handle and handle[0] == 'pallas':
            return self._pallas_coder().encode_batch_finish(handle[1])
        if isinstance(handle, tuple) and handle and handle[0] == 'planar':
            return self._planar_coder().encode_batch_finish(handle[1])
        (latent_shape, symbols, buf, n_words, states, theo, k, x0,
         sels) = handle
        b = symbols.shape[0]
        # one blocking transfer for all the small outputs
        theo, n_words, states, k = jax.device_get((theo, n_words, states, k))
        theo, n_words, states, k = map(np.asarray,
                                       (theo, n_words, states, k))
        wmax = int(n_words.max()) if n_words.size else 0
        wmax = max(64, -(-wmax // 64) * 64)                # bucket to bound recompiles
        wmax = min(wmax, buf.shape[1])
        words = np.asarray(jax.device_get(buf[:, :wmax]))
        tail = x0 < rans.RANS_L
        legacy = None
        if tail and k.size and int(k.max()) > K_CAP:
            # Pathological low-entropy lanes (a lane needs > K_CAP symbols
            # to accumulate 16 state bits): re-encode the whole batch with
            # the classic seed and serialize the affected images from it.
            encode_streams = self._device_helpers(latent_shape)[0]
            lbuf, ln_words, lstates, _ = jax.device_get(
                encode_streams(*sels, x0=rans.RANS_L))
            legacy = (np.asarray(lbuf), np.asarray(ln_words),
                      np.asarray(lstates))
        results = []
        for i in range(b):
            if legacy is not None and int(k[i].max()) > K_CAP:
                lbuf, ln_words, lstates = legacy
                stream = lbuf[i, :ln_words[i]][::-1].astype(np.uint32)
                st_i, k_i = lstates[i], None
            else:
                stream = words[i, :n_words[i]][::-1].astype(np.uint32)
                st_i, k_i = states[i], (k[i] if tail else None)
            bitstream = serialize_stream(latent_shape, stream, st_i,
                                         symbol_crc(symbols[i]),
                                         impl_id=IMPL_IDS[self.impl],
                                         k=k_i)
            results.append(EncodeResult(bitstream=bitstream,
                                        num_bits=len(bitstream) * 8,
                                        theoretical_bits=float(theo[i]),
                                        symbols=symbols[i]))
        return tuple(results)

    def encode_batch(self, pc_params, symbols: np.ndarray, centers: np.ndarray
                     ) -> Tuple[EncodeResult, ...]:
        """symbols: (B, C, H, W). Encodes all images in one device pass;
        the reverse rANS encode also runs on device, so only the final
        streams (~kilobytes) cross the host link."""
        return self.encode_batch_finish(
            self.encode_batch_submit(pc_params, symbols, centers))

    def decode_batch_submit(self, pc_params, bitstreams, centers: np.ndarray):
        """Dispatch the device side of a decode; returns a handle for
        decode_batch_finish. Routes to the implementation recorded in the
        container header (streams are impl-locked; the header self-routes)."""
        pad = self._mesh_pad(len(bitstreams))
        if pad:
            n_real = len(bitstreams)
            bitstreams = list(bitstreams) + [bitstreams[-1]] * pad
            return ('meshpad', n_real,
                    self.decode_batch_submit(pc_params, bitstreams, centers))
        impl_id = stream_impl_id(bitstreams[0])
        assert all(stream_impl_id(bs) == impl_id for bs in bitstreams), \
            'mixed codec impls in one decode batch'
        target = self._route(impl_id)
        if target is not self:
            return ('routed', impl_id,
                    target.decode_batch_submit(pc_params, bitstreams, centers))
        if self.impl == 'pallas':
            return ('pallas', self._pallas_coder().decode_batch_submit(
                pc_params, bitstreams, centers))
        if self.impl == 'planar':
            return ('planar', self._planar_coder().decode_batch_submit(
                pc_params, bitstreams, centers))
        parsed = [deserialize_stream(bs) for bs in bitstreams]
        latent_shape = parsed[0][0]
        assert all(p[0] == latent_shape for p in parsed), 'mixed shapes'
        b = len(parsed)
        run, sched = self._batched_scan_fn(latent_shape)
        _, _, pack_syms, pad_streams = self._device_helpers(latent_shape)
        r = rans.R_LANES if sched.M >= rans.R_LANES else sched.M
        w_buf = sched.T * sched.M
        wmax = max([1] + [len(p[1]) for p in parsed])
        wmax = min(max(64, -(-wmax // 64) * 64), w_buf)
        packed = np.zeros((b, wmax), np.uint32)
        states = np.zeros((b, r), np.uint32)
        thresh = np.full((b, r), np.iinfo(np.int32).max // 2, np.int32)
        totals = self._lane_totals(latent_shape)
        for i, (_, stream_words, st, _crc, k) in enumerate(parsed):
            states[i] = st
            packed[i, :len(stream_words)] = stream_words
            if k is not None:        # tail-packed: no pull in the last k
                thresh[i] = totals - k.astype(np.int32)
        streams = pad_streams(self._shard(packed), t=w_buf)
        dummy_true = self._shard(
            np.zeros((b, int(np.prod(latent_shape))), np.int8))
        syms, _, _, _ = run(pc_params, jnp.asarray(centers), dummy_true,
                            streams, self._shard(states), jnp.int32(0),
                            self._shard(thresh))
        return (latent_shape, parsed, pack_syms(syms))

    def decode_batch_finish(self, handle, verify: bool = True,
                            device_out: bool = False) -> np.ndarray:
        if isinstance(handle, tuple) and handle:
            if handle[0] == 'meshpad':
                out = self.decode_batch_finish(handle[2], verify=verify,
                                               device_out=device_out)
                return out[:handle[1]]
            if handle[0] == 'routed':
                return self._route(handle[1]).decode_batch_finish(
                    handle[2], verify=verify, device_out=device_out)
            if handle[0] == 'pallas':
                return self._pallas_coder().decode_batch_finish(
                    handle[1], verify=verify, device_out=device_out)
            if handle[0] == 'planar':
                return self._planar_coder().decode_batch_finish(
                    handle[1], verify=verify, device_out=device_out)
        latent_shape, parsed, packed_syms = handle
        b = len(parsed)
        out = np.asarray(jax.device_get(packed_syms), np.int32)  # (B, n)
        out = out.reshape((b,) + latent_shape)
        if verify:
            for i in range(b):
                if symbol_crc(out[i]) != parsed[i][3]:
                    raise ValueError(
                        f'decode CRC mismatch for image {i}: corrupt stream, '
                        'or decode ran with a different executable than encode')
        if device_out:
            # XLA impls verify via a host CRC (the download is needed
            # anyway), but the device copy is returned without a re-upload.
            return packed_syms.reshape((b,) + latent_shape).astype(jnp.int32)
        return out

    def decode_batch(self, pc_params, bitstreams, centers: np.ndarray,
                     verify: bool = True, device_out: bool = False
                     ) -> np.ndarray:
        """-> (B, C, H, W) symbols, all images decoded in one device pass.
        device_out=True keeps the result on device (the pallas impl then
        verifies via device-computed checksums without downloading it)."""
        return self.decode_batch_finish(
            self.decode_batch_submit(pc_params, bitstreams, centers),
            verify=verify, device_out=device_out)

    def encode(self, pc_params, symbols: np.ndarray, centers: np.ndarray
               ) -> EncodeResult:
        """symbols: (C, H, W) int; centers: (L,) float32. Routes through
        the B=1 batched path (one executable family for all callers)."""
        return self.encode_batch(pc_params, np.asarray(symbols)[None], centers)[0]

    def decode(self, pc_params, bitstream: bytes, centers: np.ndarray,
               verify: bool = True) -> np.ndarray:
        return self.decode_batch(pc_params, [bitstream], centers,
                                 verify=verify)[0]

    def roundtrip(self, pc_params, symbols: np.ndarray, centers: np.ndarray
                  ) -> EncodeResult:
        """Encode, decode, assert bit-exact symbol recovery
        (the reference's oracle, ref: bit_counter.py:68)."""
        result = self.encode(pc_params, symbols, centers)
        decoded = self.decode(pc_params, result.bitstream, centers)
        np.testing.assert_array_equal(np.asarray(symbols, np.int32), decoded)
        return result


# ---------------------------------------------------------------------------
# Bitstream container
# ---------------------------------------------------------------------------

def _pack_states(final_states: np.ndarray, wide: bool = False) -> bytes:
    """Entropy-pack R decoder-entry rANS states (v11 writer).
    x = hi*2^16 + lo: lo is a uniform slot (incompressible, shipped
    raw); hi ships as a bit-length DESCRIPTOR table followed by every
    lane's MSB-implicit mantissa. The first bit selects the descriptor
    scheme, exact-min: scheme 1 runs the descriptors through the shared
    flat/Rice coder (_rice_pack_bits — on real streams the final states
    cluster near 2**32, so the bit-lengths sit at 15-16 and Rice around
    the median costs ~1.3 bits/lane); scheme 0 is the v10 per-lane
    descriptor code (4 bits; wide: d=15 borrows a 16th-length selector
    bit) as the worst-case escape, so v11 never pays more than the
    selector bit over v10. serialize_stream still escapes the whole
    block to raw u32 states (header rawesc bit) whenever packing would
    not beat raw.

    wide=True (tail-packed streams, x0=1): hi may be 0 — a lane whose
    whole content fits the sub-2^16 warmup; descriptor = bit_length(hi)
    in [0, 16], mantissa bit_length-1 bits. wide=False (classic seed):
    hi >= 1; descriptor = bit_length(hi)-1 in [0, 15], mantissa
    descriptor bits."""
    st = np.asarray(final_states, np.uint64)
    lo = (st & np.uint64(0xFFFF)).astype(np.uint16)
    his = [int(v) for v in (st >> np.uint64(16))]
    if wide:
        ln = [h.bit_length() for h in his]                 # in [0, 16]
        mw = [max(l - 1, 0) for l in ln]
    else:
        assert min(his) >= 1, 'rANS state below the renormalization interval'
        ln = [h.bit_length() - 1 for h in his]             # in [0, 15]
        mw = ln
    acc1, nb1 = _rice_pack_bits(np.asarray(ln, np.int64), 1, 1)
    acc0, nb0 = 0, 1
    for l in ln:
        if wide and l >= 15:
            acc0 |= (15 | ((l - 15) << 4)) << nb0
            nb0 += 5
        else:
            acc0 |= l << nb0
            nb0 += 4
    acc, nbits = (acc1, nb1) if nb1 < nb0 else (acc0, nb0)
    for h, w in zip(his, mw):
        if w:
            acc |= (h - (1 << w)) << nbits                 # MSB implicit
            nbits += w
    return lo.tobytes() + acc.to_bytes((nbits + 7) // 8, 'little')


def _unpack_states_v11(r: int, data: bytes, pos: int, wide: bool = False):
    """Inverse of the v11 _pack_states; returns (states_u32,
    bytes_consumed)."""
    if pos + 2 * r > len(data):
        raise ValueError('truncated container (state block)')
    lo = np.frombuffer(data[pos:pos + 2 * r], np.uint16)
    base = pos + 2 * r
    scheme = _read_bits(data, base, 0, 1)
    bits = 1
    lnmax = 16 if wide else 15
    if scheme:
        lns, bits = _rice_unpack_bits(r, data, base, bits)
        if lns.min() < 0 or lns.max() > lnmax:
            raise ValueError('corrupt container (state descriptors)')
        ln = [int(v) for v in lns]
    else:
        ln = []
        for _ in range(r):
            l = _read_bits(data, base, bits, 4)
            bits += 4
            if wide and l == 15:
                l += _read_bits(data, base, bits, 1)
                bits += 1
            ln.append(l)
    hi = np.empty(r, np.uint32)
    for i, l in enumerate(ln):
        if wide and l == 0:
            hi[i] = 0
            continue
        w = l - 1 if wide else l
        hi[i] = (1 << w) | _read_bits(data, base, bits, w)
        bits += w
    consumed = 2 * r + (bits + 7) // 8
    if pos + consumed > len(data):
        raise ValueError('truncated container (state block)')
    states = (hi.astype(np.uint32) << np.uint32(16)) | lo.astype(np.uint32)
    return states, consumed


def _read_bits(data: bytes, base: int, bitoff: int, n: int) -> int:
    """Read n (<= 16) bits at bit offset bitoff from data[base:]."""
    byte0 = base + bitoff // 8
    chunk = int.from_bytes(data[byte0:byte0 + 4], 'little')
    return (chunk >> (bitoff % 8)) & ((1 << n) - 1)


def _unpack_states(r: int, data: bytes, pos: int, wide: bool = False,
                   v8wide: bool = False):
    """Frozen v8/v9/v10 states parser (per-lane interleaved descriptor +
    mantissa; v11 moved to a scheme-selected descriptor TABLE followed
    by the mantissas — _unpack_states_v11). Returns (states_u32,
    bytes_consumed). v8wide parses the container-v8 flat 5-bit wide
    descriptor (v9 moved to the 4-bit + escape scheme)."""
    if pos + 2 * r > len(data):
        raise ValueError('truncated container (state block)')
    lo = np.frombuffer(data[pos:pos + 2 * r], np.uint16)
    base = pos + 2 * r
    bits = 0
    hi = np.empty(r, np.uint32)
    for i in range(r):
        if v8wide:
            ln = _read_bits(data, base, bits, 5)  # bit_length(hi) in [0,16]
            bits += 5
            if ln:
                hi[i] = (1 << (ln - 1)) | _read_bits(data, base, bits, ln - 1)
                bits += ln - 1
            else:
                hi[i] = 0
        elif wide:
            ln = _read_bits(data, base, bits, 4)
            bits += 4
            if ln == 15:                         # 15/16 selector bit
                ln = 15 + _read_bits(data, base, bits, 1)
                bits += 1
            if ln:
                hi[i] = (1 << (ln - 1)) | _read_bits(data, base, bits, ln - 1)
                bits += ln - 1
            else:
                hi[i] = 0
        else:
            ln = _read_bits(data, base, bits, 4)
            bits += 4
            hi[i] = (1 << ln) | _read_bits(data, base, bits, ln)
            bits += ln
    states = (hi.astype(np.uint32) << np.uint32(16)) | lo.astype(np.uint32)
    return states, 2 * r + (bits + 7) // 8


K_CAP = 65535        # per-lane warmup cap (16-bit k entries at most —
                     # real content runs k in the thousands: importance-
                     # map-masked regions are near-deterministic, so a
                     # lane's first ~40% of symbols can carry < 16 bits
                     # total); an image exceeding it (plausible only for
                     # an all-masked giant image) re-encodes with
                     # x0=RANS_L


def serialize_stream(latent_shape, stream_words: np.ndarray,
                     final_states: np.ndarray, sym_crc: int = 0,
                     impl_id: int = IMPL_RING, prec: int = 0,
                     k=None) -> bytes:
    """Container v11, 11/12/14 fixed header bytes (bit-packed,
    LSB-first): magic(8) version(4) impl(3) tail(1) prec(2) rawesc(1)
    shapewide(1) nstates(7) shapenarrow(1) shape(3x12; 3x16 when
    shapewide for latent dims >= 4096; 3x8 when every dim < 256)
    crc(32); then the packed states block (_pack_states: raw lo words,
    a scheme-selected hi-descriptor table, the hi mantissas) [then the
    k-table] and the 16-bit stream words (their count is derived from
    the remaining length — no nwords field).

    rawesc escapes to raw u32 states for the rare all-long-hi batch
    where entropy packing would cost more than raw.

    k != None marks a TAIL-PACKED stream (tail header bit): the encoder
    seeded its lanes at x0=1 and k[lane] warmup symbols at each lane's
    decode tail must not pull renorm words (rans.scalar_encode). The
    k-table is one flat/Rice table (_rice_pack_bits); every k must be
    <= K_CAP — encoders fall back to x0=RANS_L (k=None) otherwise."""
    r = len(final_states)
    assert r < 128
    packed = _pack_states(final_states, wide=k is not None)
    rawesc = len(packed) > 4 * r                    # packing must never lose
    if rawesc:
        packed = final_states.astype(np.uint32).tobytes()
    shape = tuple(int(v) for v in latent_shape)
    assert len(shape) == 3 and all(0 <= v < (1 << 16) for v in shape), shape
    shapewide = any(v >= (1 << 12) for v in shape)
    shapenarrow = all(v < (1 << 8) for v in shape)   # v10: 8-bit dims,
    hdr = int.from_bytes(MAGIC, 'little')            # header 12 -> 11 B
    hdr |= VERSION << 8
    hdr |= (impl_id & 0x7) << 12
    hdr |= (1 if k is not None else 0) << 15
    hdr |= (prec & 0x3) << 16
    hdr |= (1 if rawesc else 0) << 18
    hdr |= (1 if shapewide else 0) << 19
    hdr |= r << 20
    hdr |= (1 if shapenarrow else 0) << 27
    pos = 28
    sw = 16 if shapewide else (8 if shapenarrow else 12)
    for v in shape:
        hdr |= v << pos
        pos += sw
    hdr |= (sym_crc & 0xFFFFFFFF) << pos
    pos += 32
    buf = io.BytesIO()
    buf.write(hdr.to_bytes((pos + 7) // 8, 'little'))
    buf.write(packed)
    if k is not None:
        k = np.asarray(k, np.int64)
        assert len(k) == r and k.min() >= 0 and k.max() <= K_CAP, \
            (len(k), r, int(k.min()), int(k.max()))
        buf.write(_pack_ktable(k))
    buf.write(stream_words.astype(np.uint16).tobytes())
    return buf.getvalue()


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, 2 * res, -2 * res - 1).astype(np.int64)


def _best_rice_param(z: np.ndarray) -> Tuple[int, int]:
    """(m, payload_bits) minimizing the Rice payload for zigzags z."""
    best_m, best = 0, None
    for m in range(16):
        c = int(np.sum(z >> m)) + len(z) * (1 + m)
        if best is None or c < best:
            best_m, best = m, c
    return best_m, best


def _rice_pack_bits(k: np.ndarray, acc: int, nb: int, extended: bool = True):
    """Exact-min flat/Rice code for a small non-negative integer array,
    appended to an (acc, nb) LSB-first bit accumulator. Layout: a varint
    anchor (5-bit bit_length, then bit_length-1 mantissa bits with the
    MSB implicit; length 0 encodes anchor 0), a scheme field, 4 param
    bits, payload. Schemes (the cheapest TOTAL cost, anchor included,
    is chosen exactly):
      0   = flat: anchor = min(k), len(k) deltas of kw = param+1 bits
            (the v9 code behind a scheme bit — the worst-case escape);
      10  = Rice-median: anchor = median(k), per entry
            zigzag(k - anchor) as q one-bits + a zero + param remainder
            bits;
      11  = Rice-delta (extended=True only, container v11+): anchor =
            k[0], len(k)-1 zigzag lane-adjacent deltas k[i] - k[i-1]
            through the same Rice code — neighboring rANS lanes track
            correlated content (measured delta std ~0.75x the median-
            residual std on real streams, probe30), and the first
            lane's payload folds into the anchor.
    With extended=False (the frozen container-v10 k-table format) the
    scheme field is the 1-bit flat/Rice-median selector. Used by the
    v10+ k-table and the v11 state-descriptor table (both arrays
    cluster around their median with thin tails — PERF.md)."""
    r = len(k)
    rice_tag = 2 if extended else 1          # scheme-field bits for Rice

    def anchor_bits(a):
        return 5 + max(a.bit_length() - 1, 0)

    kmin = int(k.min())
    kw = max(1, int(k.max() - kmin).bit_length())
    z_med = _zigzag(k - int(np.median(k)))
    med_m, med_payload = _best_rice_param(z_med)
    cands = [
        (anchor_bits(kmin) + 1 + 4 + r * kw, 0, kmin, kw - 1, None),
        (anchor_bits(int(np.median(k))) + rice_tag + 4 + med_payload,
         1, int(np.median(k)), med_m, z_med),
    ]
    if extended and r > 1:
        z_d = _zigzag(np.diff(k.astype(np.int64)))
        d_m, d_payload = _best_rice_param(z_d)
        cands.append((anchor_bits(int(k[0])) + rice_tag + 4 + d_payload,
                      2, int(k[0]), d_m, z_d))
    _, scheme, anchor, param, z = min(cands, key=lambda c: c[0])
    ln = anchor.bit_length()
    assert ln <= 16
    acc |= ln << nb                  # varint anchor: 5-bit length 0..16
    nb += 5
    if ln:
        acc |= (anchor - (1 << (ln - 1))) << nb      # MSB implicit
        nb += ln - 1
    if scheme == 0:
        acc |= 0 << nb                               # flat
        nb += 1
        acc |= param << nb
        nb += 4
        for kv in k:
            acc |= (int(kv) - anchor) << nb
            nb += param + 1
    else:
        acc |= 1 << nb                               # Rice
        nb += 1
        if extended:
            acc |= (scheme - 1) << nb                # 0 median / 1 delta
            nb += 1
        acc |= param << nb
        nb += 4
        for zv in z:
            q = int(zv) >> param
            acc |= ((1 << q) - 1) << nb              # q ones + a zero
            nb += q + 1
            acc |= (int(zv) & ((1 << param) - 1)) << nb
            nb += param
    return acc, nb


def _rice_unpack_bits(r: int, data: bytes, pos: int, bits: int,
                      extended: bool = True):
    """Inverse of _rice_pack_bits; returns (values_int32, bit_offset
    after the table). Raises cleanly on corrupt input (fuzz contract)."""
    ln = _read_bits(data, pos, bits, 5)
    bits += 5
    if ln > 16:
        raise ValueError('corrupt rice table (anchor length)')
    anchor = 0
    if ln:
        anchor = (1 << (ln - 1)) | _read_bits(data, pos, bits, ln - 1)
        bits += ln - 1
    scheme = _read_bits(data, pos, bits, 1)
    bits += 1
    if scheme and extended:
        scheme += _read_bits(data, pos, bits, 1)     # 1 median / 2 delta
        bits += 1
    param = _read_bits(data, pos, bits, 4)
    bits += 4
    k = np.empty(r, np.int32)
    if scheme == 0:
        kw = param + 1
        for i in range(r):
            k[i] = anchor + _read_bits(data, pos, bits, kw)
            bits += kw
    else:
        qcap = 2 * K_CAP + 2                 # fuzz safety: bounded unary
        if scheme == 2:                      # delta: k[0] = anchor
            k[0] = anchor
        for i in range(1 if scheme == 2 else 0, r):
            q = 0
            while _read_bits(data, pos, bits, 1):
                q += 1
                bits += 1
                if q > qcap or pos + (bits >> 3) >= len(data):
                    raise ValueError('corrupt rice table (unbounded unary)')
            bits += 1
            z = (q << param) | _read_bits(data, pos, bits, param)
            bits += param
            res = (z >> 1) if (z & 1) == 0 else -((z + 1) >> 1)
            k[i] = (k[i - 1] + res) if scheme == 2 else (anchor + res)
    return k, bits


def _pack_ktable(k: np.ndarray) -> bytes:
    """v10+ k-table: one flat/Rice table (see _rice_pack_bits; the
    Rice-delta scheme only appears inside v11+ containers)."""
    acc, nb = _rice_pack_bits(k, 0, 0)
    return acc.to_bytes((nb + 7) // 8, 'little')


def _unpack_ktable(r: int, data: bytes, pos: int, extended: bool = True):
    """Inverse of _pack_ktable; returns (k_int32, bytes_consumed).
    extended=False parses the frozen container-v10 1-bit scheme field."""
    k, bits = _rice_unpack_bits(r, data, pos, 0, extended=extended)
    if k.min() < 0:
        raise ValueError('corrupt k-table (negative warmup count)')
    return k, (bits + 7) // 8


def _deserialize_v8(data: bytes):
    """Frozen v8 parser (15-byte byte-oriented header: magic version impl
    prec shape(3x u16) crc(u32) nstates) so v8-era archives stay
    decodable — the payload semantics (stream words, states, k warmups)
    are identical to v9; only the container side-info packing changed."""
    tail_mode = bool(data[2] & 0x80)
    latent_shape = tuple(int(v) for v in np.frombuffer(data[4:10], np.uint16))
    sym_crc = int(np.frombuffer(data[10:14], np.uint32)[0])
    r = data[14]
    if r & 0x80:                                     # raw-states escape
        r &= 0x7F
        if 15 + 4 * r > len(data):
            raise ValueError('truncated container (raw states)')
        states = np.frombuffer(data[15:15 + 4 * r], np.uint32).copy()
        consumed = 4 * r
    else:
        states, consumed = _unpack_states(r, data, 15, v8wide=tail_mode)
    pos = 15 + consumed
    k = None
    if tail_mode:
        kw = data[pos]
        pos += 1
        k = np.empty(r, np.int32)
        for i in range(r):
            k[i] = _read_bits(data, pos, i * kw, kw)
        pos += (r * kw + 7) // 8
    tail = data[pos:]
    if len(tail) % 2:
        raise ValueError('truncated container')
    stream_words = np.frombuffer(tail, np.uint16).astype(np.uint32)
    return latent_shape, stream_words, states, sym_crc, k


def deserialize_stream(data: bytes):
    """-> (latent_shape, stream_words, states, sym_crc, k) with k = None
    for x0=RANS_L streams, else the (R,) int32 warmup table."""
    assert data[:1] == MAGIC, 'bad magic'
    version = (data[1]) & 0xF
    if version == 8:
        return _deserialize_v8(data)
    # v9/v10/v11 share the header layout — one parser, two version
    # branches below: v9 keeps the flat span-width k-table, v9/v10 keep
    # the per-lane interleaved state descriptors (v11 moved them to a
    # scheme-selected descriptor table).
    assert version in (9, 10, VERSION), version
    hdr = int.from_bytes(data[:14], 'little')
    tail_mode = bool((hdr >> 15) & 1)
    rawesc = bool((hdr >> 18) & 1)
    shapewide = bool((hdr >> 19) & 1)
    r = (hdr >> 20) & 0x7F
    shapenarrow = bool((hdr >> 27) & 1)             # v10 (v9 spare = 0)
    sw = 16 if shapewide else (8 if shapenarrow else 12)
    latent_shape = tuple((hdr >> (28 + i * sw)) & ((1 << sw) - 1)
                         for i in range(3))
    sym_crc = (hdr >> (28 + 3 * sw)) & 0xFFFFFFFF
    pos = (28 + 3 * sw + 32 + 7) // 8               # 11, 12 or 14
    if rawesc:
        if pos + 4 * r > len(data):
            raise ValueError('truncated container (raw states)')
        states = np.frombuffer(data[pos:pos + 4 * r], np.uint32).copy()
        pos += 4 * r
    elif version >= 11:
        states, consumed = _unpack_states_v11(r, data, pos, wide=tail_mode)
        pos += consumed
    else:
        states, consumed = _unpack_states(r, data, pos, wide=tail_mode)
        pos += consumed
    k = None
    if tail_mode:
        if version == 9:                      # frozen v9 flat k-table
            kmin = int(np.frombuffer(data[pos:pos + 2], np.uint16)[0])
            pos += 2
            kw = _read_bits(data, pos, 0, 4) + 1
            k = np.empty(r, np.int32)
            for i in range(r):
                k[i] = kmin + _read_bits(data, pos, 4 + i * kw, kw)
            pos += (4 + r * kw + 7) // 8
        else:
            k, consumed = _unpack_ktable(r, data, pos,
                                         extended=version >= 11)
            pos += consumed
    if pos > len(data):
        raise ValueError('truncated container (side info)')
    tail = data[pos:]
    assert len(tail) % 2 == 0, 'truncated container'
    stream_words = np.frombuffer(tail, np.uint16).astype(np.uint32)
    return latent_shape, stream_words, states, sym_crc, k


def stream_impl_id(data: bytes) -> int:
    assert data[:1] == MAGIC, 'bad magic'
    if (data[1] & 0xF) == 8:                # v8: impl byte (bit 7 = tail)
        return data[2] & 0x7F
    return (data[1] >> 4) & 0x7


def stream_prec(data: bytes) -> int:
    """Kernel ring precision the stream was encoded with (0 = f32,
    1 = bf16, 2 = f8_e4m3 inner rings). Streams are only decodable at
    their own precision."""
    assert data[:1] == MAGIC, 'bad magic'
    if (data[1] & 0xF) == 8:                # v8: dedicated prec byte
        return data[3]
    return data[2] & 0x3
