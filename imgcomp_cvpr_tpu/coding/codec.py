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
VERSION = 7  # v6 + slim header (24 -> 15 bytes) and entropy-packed rANS
             # lane states (the 32-bit state's high half is ~1/x
             # log-uniform: 4-bit length + MSB-implicit value, ~4.5
             # bits/lane saved); v6 streams are rejected cleanly by the
             # version check. PERF.md holds the floor decomposition.

# Container impl ids: a stream must be decoded by the implementation that
# encoded it (bit-exactness holds per executable); the header makes decode
# auto-route instead of failing the CRC.
IMPL_DIRECT, IMPL_CACHED, IMPL_RING, IMPL_PALLAS, IMPL_PLANAR = 0, 1, 2, 3, 4
IMPL_IDS = {'direct': IMPL_DIRECT, 'cached': IMPL_CACHED, 'ring': IMPL_RING,
            'pallas': IMPL_PALLAS, 'planar': IMPL_PLANAR}
IMPL_NAMES = {v: k for k, v in IMPL_IDS.items()}


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
        def run(pc_params, centers, true_syms_flat, stream, init_states, mode):
            """mode: 0 = decode, 1 = encode (teacher-forced). Same executable
            for both — that is the bit-exactness guarantee."""
            pad_value = pc_lib.auto_pad_value(self.pc_config, centers, pc_params)
            volume = jnp.full((flat_size,), pad_value, jnp.float32)

            def step(carry, x):
                volume, states, gptr = carry
                idx = x['base'][:, None] + ctx_offsets[None, :]      # (M, n_ctx)
                patches = jnp.take(volume, idx, axis=0)
                patches = patches.reshape(-1, ctx_d, cs, cs)
                logits = self.pc.logits_from_padded(pc_params, patches)  # (M,1,1,1,L)
                logits = logits.reshape(logits.shape[0], -1)
                probs = jax.nn.softmax(logits, axis=-1)
                freq, cdf_low = rans.quantize_cdf(probs)

                sym_dec, states, gptr = rans.decode_step_interleaved(
                    states, gptr, stream, freq, cdf_low, x['active'])
                sym_true = jnp.take(true_syms_flat, x['sym_idx']).astype(jnp.int32)
                sym = jnp.where(mode == 1, sym_true, sym_dec)
                sym = jnp.where(x['active'], sym, 0)

                value = jnp.take(centers, sym)
                volume = volume.at[x['scatter']].set(
                    jnp.where(x['active'], value, 0.0), mode='drop')

                sel = sym[:, None].astype(jnp.int32)
                freq_sel = jnp.take_along_axis(freq, sel, axis=-1)[:, 0]
                start_sel = jnp.take_along_axis(cdf_low, sel, axis=-1)[:, 0]
                return (volume, states, gptr), (sym.astype(jnp.int8), freq_sel,
                                                start_sel)

            init = (volume, init_states, jnp.zeros((), jnp.int32))
            (_, _, final_gptr), ys = jax.lax.scan(step, init, xs)
            syms, freq_sel, start_sel = ys
            return syms, freq_sel, start_sel, final_gptr

        return run, sched

    @functools.lru_cache(maxsize=8)
    def _batched_scan_fn(self, latent_shape: Tuple[int, int, int]):
        """vmapped scan over a leading image-batch dim: one compiled scan
        decodes B images concurrently (B x M lanes per step), amortizing
        the per-step dispatch and filling the chip."""
        run, sched = self._scan_fn(latent_shape)
        batched = jax.jit(jax.vmap(run, in_axes=(None, None, 0, 0, 0, None)))
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

        @jax.jit
        def encode_streams(freq_sel, start_sel):
            # (B, T, M) -> reversed word buffer + count + (R,) states
            return jax.vmap(
                lambda f, s: rans.encode_reverse_scan_interleaved(f, s, active_c)
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
        _, freq_sel, start_sel, _ = run(
            pc_params, jnp.asarray(centers),
            self._shard(symbols.reshape(b, -1).astype(np.int8)),
            streams_dummy, states_dummy, jnp.int32(1))
        buf, n_words, states = encode_streams(freq_sel, start_sel)
        theo = theoretical_bits(freq_sel)
        return (latent_shape, symbols, buf, n_words, states, theo)

    def encode_batch_finish(self, handle) -> Tuple[EncodeResult, ...]:
        if isinstance(handle, tuple) and handle and handle[0] == 'meshpad':
            return self.encode_batch_finish(handle[2])[:handle[1]]
        if isinstance(handle, tuple) and handle and handle[0] == 'pallas':
            return self._pallas_coder().encode_batch_finish(handle[1])
        if isinstance(handle, tuple) and handle and handle[0] == 'planar':
            return self._planar_coder().encode_batch_finish(handle[1])
        latent_shape, symbols, buf, n_words, states, theo = handle
        b = symbols.shape[0]
        # one blocking transfer for all the small outputs
        theo, n_words, states = jax.device_get((theo, n_words, states))
        theo, n_words, states = map(np.asarray, (theo, n_words, states))
        wmax = int(n_words.max()) if n_words.size else 0
        wmax = max(64, -(-wmax // 64) * 64)                # bucket to bound recompiles
        wmax = min(wmax, buf.shape[1])
        words = np.asarray(jax.device_get(buf[:, :wmax]))
        results = []
        for i in range(b):
            stream = words[i, :n_words[i]][::-1].astype(np.uint32)
            bitstream = serialize_stream(latent_shape, stream, states[i],
                                         symbol_crc(symbols[i]),
                                         impl_id=IMPL_IDS[self.impl])
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
        for i, (_, stream_words, st, _crc) in enumerate(parsed):
            states[i] = st
            packed[i, :len(stream_words)] = stream_words
        streams = pad_streams(self._shard(packed), t=w_buf)
        dummy_true = self._shard(
            np.zeros((b, int(np.prod(latent_shape))), np.int8))
        syms, _, _, _ = run(pc_params, jnp.asarray(centers), dummy_true,
                            streams, self._shard(states), jnp.int32(0))
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

def _pack_states(final_states: np.ndarray) -> bytes:
    """Entropy-pack R decoder-entry rANS states. x = hi*2^16 + lo with
    hi in [1, 2^16): lo is a uniform slot (incompressible, shipped raw);
    hi is ~1/x log-uniform, shipped as a 4-bit length len = bit_length-1
    plus len value bits with the MSB implicit (~11.5 bits avg vs 16).
    Saves ~4.5 bits/lane typically; the worst case (every hi at 16 bits)
    costs 19 bits/lane, so serialize_stream escapes to raw u32 states
    (nstates high bit) whenever packing would not win."""
    st = np.asarray(final_states, np.uint64)
    lo = (st & np.uint64(0xFFFF)).astype(np.uint16)
    hi = (st >> np.uint64(16)).astype(np.uint32)
    acc = 0
    nbits = 0
    for h in hi:
        h = int(h)
        assert h >= 1, 'rANS state below the renormalization interval'
        ln = h.bit_length() - 1                 # in [0, 15]
        acc |= ln << nbits
        nbits += 4
        acc |= (h - (1 << ln)) << nbits         # MSB implicit
        nbits += ln
    packed = acc.to_bytes((nbits + 7) // 8, 'little')
    return lo.tobytes() + packed


def _read_bits(data: bytes, base: int, bitoff: int, n: int) -> int:
    """Read n (<= 16) bits at bit offset bitoff from data[base:]."""
    byte0 = base + bitoff // 8
    chunk = int.from_bytes(data[byte0:byte0 + 4], 'little')
    return (chunk >> (bitoff % 8)) & ((1 << n) - 1)


def _unpack_states(r: int, data: bytes, pos: int):
    """Inverse of _pack_states; returns (states_u32, bytes_consumed)."""
    lo = np.frombuffer(data[pos:pos + 2 * r], np.uint16)
    base = pos + 2 * r
    bits = 0
    hi = np.empty(r, np.uint32)
    for i in range(r):
        ln = _read_bits(data, base, bits, 4)
        bits += 4
        hi[i] = (1 << ln) | _read_bits(data, base, bits, ln)
        bits += ln
    states = (hi.astype(np.uint32) << np.uint32(16)) | lo.astype(np.uint32)
    return states, 2 * r + (bits + 7) // 8


def serialize_stream(latent_shape, stream_words: np.ndarray,
                     final_states: np.ndarray, sym_crc: int = 0,
                     impl_id: int = IMPL_RING, prec: int = 0) -> bytes:
    """Container v7, 15 fixed header bytes: magic(1) version(1) impl(1)
    prec(1) shape(3x u16) crc(4) nstates(1); then the packed states
    block and the 16-bit stream words (their count is derived from the
    remaining length — no nwords field). nstates' high bit escapes to
    raw u32 states for the rare all-long-hi batch where entropy packing
    would cost more than raw."""
    r = len(final_states)
    assert r < 128
    packed = _pack_states(final_states)
    if len(packed) > 4 * r:                         # packing must never lose
        r |= 0x80
        packed = final_states.astype(np.uint32).tobytes()
    buf = io.BytesIO()
    buf.write(MAGIC)
    buf.write(np.asarray([VERSION], np.uint8).tobytes())
    buf.write(np.asarray([impl_id], np.uint8).tobytes())
    buf.write(np.asarray([prec], np.uint8).tobytes())
    buf.write(np.asarray(latent_shape, np.uint16).tobytes())
    buf.write(np.asarray([sym_crc], np.uint32).tobytes())
    buf.write(np.asarray([r], np.uint8).tobytes())
    buf.write(packed)
    buf.write(stream_words.astype(np.uint16).tobytes())
    return buf.getvalue()


def deserialize_stream(data: bytes):
    assert data[:1] == MAGIC, 'bad magic'
    version = data[1]
    assert version == VERSION, version
    latent_shape = tuple(int(v) for v in np.frombuffer(data[4:10], np.uint16))
    sym_crc = int(np.frombuffer(data[10:14], np.uint32)[0])
    r = data[14]
    if r & 0x80:                                     # raw-states escape
        r &= 0x7F
        states = np.frombuffer(data[15:15 + 4 * r], np.uint32).copy()
        consumed = 4 * r
    else:
        states, consumed = _unpack_states(r, data, 15)
    tail = data[15 + consumed:]
    assert len(tail) % 2 == 0, 'truncated container'
    stream_words = np.frombuffer(tail, np.uint16).astype(np.uint32)
    return latent_shape, stream_words, states, sym_crc


def stream_impl_id(data: bytes) -> int:
    assert data[:1] == MAGIC, 'bad magic'
    return data[2]


def stream_prec(data: bytes) -> int:
    """Kernel ring precision the stream was encoded with (0 = f32,
    1 = bf16, 2 = f8_e4m3 inner rings). Streams are only decodable at
    their own precision."""
    assert data[:1] == MAGIC, 'bad magic'
    return data[3]
