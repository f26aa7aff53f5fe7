"""Top-level training driver (ref: train.py:58-269).

Wires configs -> log dir -> Trainer -> input pipelines -> the hot loop with
periodic console/JSONL logging, checkpointing, and test-split evaluation.
The hot loop is one jitted donate-in-place train step per iteration; host
work (next-batch fetch) overlaps device compute via the pipeline's
prefetch queue and JAX async dispatch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from ..data import pipeline as pipeline_lib
from ..parallel import mesh as mesh_lib
from ..utils import config as config_lib
from ..utils import logdir as logdir_lib
from ..utils import logger as logger_lib
from ..utils import registry as registry_lib
from ..utils import watchdog as watchdog_lib
from . import checkpoint as checkpoint_lib
from .trainer import Trainer


@dataclass
class TrainFlags:
    log_interval_train: int = 100
    log_interval_test: int = 1000
    log_interval_save: int = 1000
    max_steps: Optional[int] = None
    profile_steps: Optional[int] = None  # trace steps [10, 10+profile_steps)
    # Steps fused into one device dispatch (jitted lax.scan): amortizes the
    # host->device dispatch latency; never crosses a log/save/test boundary.
    steps_per_dispatch: int = 8
    # Watchdog deadline for any blocking device fetch: the axon server has
    # been observed to wedge executing large multi-step executables (accepts
    # the dispatch, result never materializes). The first multi-step
    # dispatch is verified against this deadline and falls back to
    # steps_per_dispatch=1 on a stall; later stalls abort loudly instead of
    # hanging forever. Generous default — it must cover a 1-5 min remote
    # compile of the fused train step.
    dispatch_timeout_s: float = 900.0


def _dump_test_images(log_dir: str, itr: int, trainer: Trainer, state,
                      test_batch, test_batch_np, n: int = 3) -> None:
    """Save input/output/heatmap images for the test batch (the reference's
    TB image summaries, ref train.py:163-171), as PNGs under <logdir>/imgs."""
    try:
        from PIL import Image
        ae = trainer.ae
        ae_vars = {'params': state.params['ae'],
                   'batch_stats': state.batch_stats}
        x = jax.numpy.asarray(test_batch[:n]).astype(jax.numpy.float32)
        enc = ae.apply(ae_vars, x, False, method='encode')
        x_out = ae.apply(ae_vars, enc.qhard, False, method='decode')
        out_dir = os.path.join(log_dir, 'imgs')
        os.makedirs(out_dir, exist_ok=True)
        x_out_np = np.asarray(jax.device_get(x_out)).astype(np.uint8)
        hm = enc.heatmap
        hm_np = None
        if hm is not None:
            hm_np = np.asarray(jax.device_get(jax.numpy.sum(hm, axis=-1)))
            hm_np = (hm_np / max(hm_np.max(), 1e-6) * 255).astype(np.uint8)
        for i in range(min(n, x_out_np.shape[0])):
            Image.fromarray(test_batch_np[i].astype(np.uint8)).save(
                os.path.join(out_dir, f'{itr:08d}_{i}_in.png'))
            Image.fromarray(x_out_np[i]).save(
                os.path.join(out_dir, f'{itr:08d}_{i}_out.png'))
            if hm_np is not None:
                Image.fromarray(hm_np[i]).save(
                    os.path.join(out_dir, f'{itr:08d}_{i}_hm.png'))
    except Exception as e:  # never kill training over a summary
        print(f'image dump failed: {e}')


def train(ae_config_spec: str, pc_config_spec: str,
          dataset_train: str = 'synthetic:64',
          dataset_test: str = 'synthetic:8',
          dataset_codec_distance: str = 'testset',
          log_dir_root: str = 'logs',
          restore_manager: Optional[checkpoint_lib.RestoreManager] = None,
          flags: TrainFlags = TrainFlags(),
          ckpt_interval_hours: float = 1.0,
          description: str = '',
          seed: int = 1234,
          num_devices: Optional[int] = None) -> str:
    ae_config, ae_rel = config_lib.parse_spec(ae_config_spec, 'ae')
    pc_config, pc_rel = config_lib.parse_spec(pc_config_spec, 'pc')
    print(f'Using ae_config ({ae_rel}):\n{ae_config}\n---\n'
          f'Using pc_config ({pc_rel}):\n{pc_config}')

    if restore_manager is not None and restore_manager.continue_in_ckpt_dir:
        log_dir = restore_manager.log_dir
    else:
        log_dir = logdir_lib.create_unique_log_dir(
            [ae_rel, pc_rel], log_dir_root,
            restore_dir=restore_manager.ckpt_dir if restore_manager else None)
    print(f'- LOG DIR: {log_dir}')

    if description:
        registry_lib.insert_run(
            log_dir_root, logdir_lib.log_date_from_log_dir(log_dir),
            ae_rel, pc_rel, description,
            is_continue=bool(restore_manager and restore_manager.continue_in_ckpt_dir))

    mesh = mesh_lib.make_mesh(num_devices) if (num_devices or len(jax.devices()) > 1) \
        else None

    ds_train = pipeline_lib.get_dataset(dataset_train)
    ds_test = pipeline_lib.get_dataset(dataset_test)
    ip_train = pipeline_lib.InputPipeline(
        ds_train, ae_config.crop_size, batch_size=ae_config.batch_size,
        shuffle=True).start()
    ip_test = pipeline_lib.InputPipeline(
        ds_test, ae_config.crop_size, batch_size=ae_config.batch_size,
        shuffle=False, num_crops_per_img=1).start()

    trainer = Trainer(ae_config, pc_config, num_train_images=ds_train.num_images,
                      num_crops_per_img=ip_train.num_crops_per_img, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(seed))
    start_itr = 0
    if restore_manager is not None:
        state, start_itr = restore_manager.restore(state)
        print(f'Restored at iteration {start_itr}')

    saver = checkpoint_lib.Saver(logdir_lib.ckpt_dir_for_log_dir(log_dir),
                                 max_to_keep=1,
                                 keep_every_n_hours=ckpt_interval_hours)
    train_logger = logger_lib.MetricsLogger(log_dir, 'train')
    test_logger = logger_lib.MetricsLogger(log_dir, 'test')
    timer = logger_lib.Timer(flags.log_interval_train, ae_config.batch_size)

    # Distance-to-BPG monitor on the test split (ref: train.py:133-143);
    # NaN when no measured codec curves are available.
    try:
        from ..eval import codec_distance as cd
        codec_dist = cd.CodecDistance(dataset_codec_distance, 'bpg', 'ms-ssim')
    except Exception as e:
        print(f'Cannot compute CodecDistance: {e}')
        codec_dist = None

    def d_bpg(bpp: float, ms_ssim: float) -> float:
        if codec_dist is None:
            return float('nan')
        try:
            return codec_dist.distance(bpp, ms_ssim)
        except ValueError:
            return float('nan')

    def put(batch: np.ndarray):
        if mesh is not None:
            batch = mesh_lib.pad_batch_to_multiple(batch, len(mesh.devices))
            return mesh_lib.shard_batch(batch, mesh)
        return jax.device_put(batch)

    def put_multi(stack: np.ndarray):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            stack = np.stack([mesh_lib.pad_batch_to_multiple(
                b, len(mesh.devices)) for b in stack])
            return jax.device_put(stack, NamedSharding(
                mesh, P(None, mesh_lib.DATA_AXIS)))
        return jax.device_put(stack)

    # Intervals are rounded UP to multiples of steps_per_dispatch so the
    # steady-state loop dispatches ONE compiled k-step variant (interval
    # boundaries never force odd k values mid-run; a jit recompile while
    # the prefetch thread uploads would race the remote-dispatch client).
    spd = max(1, flags.steps_per_dispatch)
    if flags.profile_steps:
        spd = 1  # per-step traces
    iv_train = iv_save = iv_test = 0
    intervals = []

    def set_spd(new_spd: int) -> None:
        nonlocal spd, iv_train, iv_save, iv_test, intervals
        spd = new_spd

        def _round_iv(iv):
            return max(spd, -(-iv // spd) * spd)

        iv_train = _round_iv(flags.log_interval_train)
        iv_save = _round_iv(flags.log_interval_save)
        iv_test = _round_iv(flags.log_interval_test) \
            if flags.log_interval_test > 0 else -1
        intervals = [iv_train, iv_save] + ([iv_test] if iv_test > 0 else [])

    set_spd(spd)

    def steps_this_dispatch(itr: int) -> int:
        k = spd
        for iv in intervals:
            k = min(k, iv - itr % iv)
        if flags.max_steps is not None:
            k = min(k, flags.max_steps - itr)
        return max(1, k)

    # One-dispatch-ahead prefetch, single-threaded: dispatch i is queued
    # asynchronously, then batch i+1's host crop/stack AND host->device
    # upload run on the main thread WHILE the device crunches dispatch i
    # (the upload is the throughput limiter on slow links). No worker
    # thread: concurrent client RPCs (upload in a thread while the main
    # thread compiles or fetches) deadlock the remote-dispatch client.
    def produce(at_itr):
        k = steps_this_dispatch(at_itr)
        if k > 1:
            stack = np.stack([ip_train.get_batch() for _ in range(k)])
            return k, put_multi(stack)
        return 1, put(ip_train.get_batch())

    itr = start_itr
    pending = None
    state_ok = True  # False after a stall: the state buffers are lost
    multi_verified = False
    try:
        while flags.max_steps is None or itr < flags.max_steps:
            if flags.profile_steps and itr == 10:
                jax.profiler.start_trace(os.path.join(log_dir, 'profile'))
            k, dev_batch = pending if pending is not None else produce(itr)
            pending = None
            if k > 1 and not multi_verified:
                # First multi-step dispatch of the run: verify it actually
                # executes within the watchdog deadline. The axon server
                # has wedged exactly here (compile ok, execution never
                # completes); the input state is donated, so a host
                # snapshot is kept for the fallback re-upload.
                host_state = jax.device_get(state)
                state, comps = trainer.train_multi(state, dev_batch)
                try:
                    watchdog_lib.fetch_with_timeout(
                        comps, flags.dispatch_timeout_s,
                        what=f'first {k}-step fused dispatch')
                    multi_verified = True
                except watchdog_lib.DispatchStallError as e:
                    print(f'*** WATCHDOG: {e}\n'
                          f'*** Falling back to steps_per_dispatch=1 and '
                          f'restoring the pre-dispatch state (step {itr}).')
                    state = (mesh_lib.replicate(host_state, mesh)
                             if mesh is not None
                             else jax.device_put(host_state))
                    set_spd(1)
                    multi_verified = True  # don't re-probe at spd=1
                    continue  # itr unchanged; next produce() uses spd=1
                del host_state
            elif k > 1:
                state, comps = trainer.train_multi(state, dev_batch)
            else:
                state, comps = trainer.train_step(state, dev_batch)
            nxt = itr + k
            if flags.max_steps is None or nxt < flags.max_steps:
                # overlaps the (async) dispatch above on the device
                pending = produce(nxt)
            itr += k  # tracked locally; int(state.step) would sync every step
            timer.add(k * ae_config.batch_size)
            if flags.profile_steps and itr == 10 + flags.profile_steps:
                jax.profiler.stop_trace()

            if itr % iv_train == 0:
                try:
                    fetched = watchdog_lib.fetch_with_timeout(
                        comps, flags.dispatch_timeout_s, what='train metrics')
                except watchdog_lib.DispatchStallError:
                    state_ok = False
                    raise
                scalars = {k: float(v) for k, v in fetched.items()}
                scalars['img_per_sec'] = timer.get_avg_ex_per_sec()
                train_logger.log(itr, scalars)
                timer.reset()

            if itr % iv_save == 0:
                saver.save(state, itr)

            if iv_test > 0 and itr % iv_test == 0:
                test_batch_np = ip_test.get_batch()
                test_batch = put(test_batch_np)
                test_out = jax.device_get(trainer.eval_step(state, test_batch))
                _dump_test_images(log_dir, itr, trainer, state, test_batch,
                                  test_batch_np)
                scalars = {k: float(v) for k, v in test_out.items()}
                scalars['d_BPG'] = d_bpg(scalars['bpp'],
                                         scalars.get('ms_ssim_eval',
                                                     scalars.get('ms_ssim', 0.0)))
                test_logger.log(itr, scalars)
    finally:
        ip_train.stop()
        ip_test.stop()
        if state_ok:
            saver.save(state, max(itr, 1))
        else:
            print('*** WATCHDOG: skipping final checkpoint — state buffers '
                  'were lost in a wedged dispatch')
        train_logger.close()
        test_logger.close()
    return log_dir
