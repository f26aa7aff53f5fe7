"""TF1 checkpoint importer: released reference checkpoints -> our params.

The reference ships three trained models (0515_1103 / 0515_1309 / 0515_1310,
ref README.md:47-49) as TF1 slim checkpoints. This maps their variable
names onto our flax param/batch-stats trees so the A/B/C parity oracles
(BASELINE.md) can run against them.

Name scheme on the TF side (derived from the reference source):
- encoder convs:      autoencoder/encoder/<scope>/weights     [kh,kw,in,out]
  + BatchNorm:        .../<scope>/BatchNorm/{beta,gamma,moving_mean,moving_variance}
  (ref: autoencoder.py:98-125,218-244; scopes h1, h2,
   res_block_enc_{b}/enc_{b}_{i}/conv{j}, res_block_enc_final/conv{j}, to_bn)
- decoder transposes: autoencoder/decoder/<scope>/weights     [kh,kw,out,in]
  (ref: autoencoder.py:246-268; scopes from_bn, res_block_dec_{b}/dec_{b}_{i}/
   conv{j}, dec_after_res/conv{j}, h12, h13)
- centers:            autoencoder/encoder/centers             (ref: quantizer.py:11-15)
- context model:      probclass3d/logits/[res1/]conv3d_<name>_mask/{weights,biases}
  [kd,kh,kw,in,out]   (ref: probclass.py:199-261)

Our tree (flax): params['ae'][encoder|decoder][<name>]{'w'},
[...][<name>]['BatchNorm_0']{'scale','bias'};
batch_stats[encoder|decoder][<name>]['BatchNorm_0']{'mean','var'};
params['pc'][conv0|res1/conv1|res1/conv2|conv_out]{'w','b'}.

Transforms: conv2d weights map 1:1 (HWIO); conv2d_transpose weights need a
(0,1,3,2) transpose (TF stores [kh,kw,out,in], we store [kh,kw,in,out]);
conv3d weights map 1:1.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def ae_name_pairs(ae_config) -> List[Tuple[str, Tuple[str, ...], bool]]:
    """[(tf_scope, our_path, is_transpose)] for every AE conv."""
    pairs = []

    def enc(scope, our):
        pairs.append((f'autoencoder/encoder/{scope}', ('encoder',) + our, False))

    def dec(scope, our):
        pairs.append((f'autoencoder/decoder/{scope}', ('decoder',) + our, True))

    enc('h1', ('h1',))
    enc('h2', ('h2',))
    for b in range(ae_config.arch_param_B):
        for i in range(1, 4):
            for j in (1, 2):
                enc(f'res_block_enc_{b}/enc_{b}_{i}/conv{j}',
                    (f'res_block_enc_{b}_{i}', f'conv{j}'))
    for j in (1, 2):
        enc(f'res_block_enc_final/conv{j}', ('res_block_enc_final', f'conv{j}'))
    enc('to_bn', ('to_bn',))

    dec('from_bn', ('from_bn',))
    for b in range(ae_config.arch_param_B):
        for i in range(1, 4):
            for j in (1, 2):
                dec(f'res_block_dec_{b}/dec_{b}_{i}/conv{j}',
                    (f'res_block_dec_{b}_{i}', f'conv{j}'))
    for j in (1, 2):
        dec(f'dec_after_res/conv{j}', ('dec_after_res', f'conv{j}'))
    dec('h12', ('h12',))
    dec('h13', ('h13',))
    return pairs


def pc_name_pairs() -> List[Tuple[str, Tuple[str, ...]]]:
    return [
        ('probclass3d/logits/conv3d_conv0_mask', ('conv0',)),
        ('probclass3d/logits/res1/conv3d_conv1_mask', ('res1', 'conv1')),
        ('probclass3d/logits/res1/conv3d_conv2_mask', ('res1', 'conv2')),
        ('probclass3d/logits/conv3d_conv2_mask', ('conv_out',)),
    ]


def expected_names(ae_config) -> List[str]:
    """Every TF1 variable name the importer will read for this config —
    the checkpoint-side contract, computable with no tensor values (so a
    var_names.pkl manifest alone can validate the mapping; ref
    saver.py:19-43 pickles exactly this name list next to each ckpt)."""
    names = ['autoencoder/encoder/centers']
    for tf_scope, _our, _t in ae_name_pairs(ae_config):
        names.append(f'{tf_scope}/weights')
        for bn in ('gamma', 'beta', 'moving_mean', 'moving_variance'):
            names.append(f'{tf_scope}/BatchNorm/{bn}')
    for tf_scope, _our in pc_name_pairs():
        names.append(f'{tf_scope}/weights')
        names.append(f'{tf_scope}/biases')
    return names


# Checkpoint variables that are training state, not model weights — the
# importer never reads these and a manifest check must not count them
# (TF1 slim training state: Adam slots/power accumulators, step counter,
# EMA copies).
SKIP_VAR_SUBSTRINGS = ('Adam', 'beta1_power', 'beta2_power', 'global_step',
                       'ExponentialMovingAverage', 'Momentum', 'RMSProp')


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


def import_tf1_checkpoint(ckpt_path: str, ae_config, pc_config):
    """Returns (params, batch_stats) trees matching our models.

    ckpt_path: prefix of a TF1 checkpoint (e.g. '.../ckpts/ckpt-<itr>').
    Requires tensorflow (reader only, no graph).
    """
    import tensorflow as tf
    reader = tf.train.load_checkpoint(ckpt_path)

    def get(name):
        return reader.get_tensor(name)

    ae_params: Dict = {}
    batch_stats: Dict = {}

    _set(ae_params, ('encoder', 'centers'), get('autoencoder/encoder/centers'))
    for tf_scope, our_path, is_transpose in ae_name_pairs(ae_config):
        w = get(f'{tf_scope}/weights')
        if is_transpose:
            w = np.transpose(w, (0, 1, 3, 2))  # [kh,kw,out,in] -> [kh,kw,in,out]
        _set(ae_params, our_path + ('w',), w)
        _set(ae_params, our_path + ('BatchNorm_0', 'scale'),
             get(f'{tf_scope}/BatchNorm/gamma'))
        _set(ae_params, our_path + ('BatchNorm_0', 'bias'),
             get(f'{tf_scope}/BatchNorm/beta'))
        _set(batch_stats, our_path + ('BatchNorm_0', 'mean'),
             get(f'{tf_scope}/BatchNorm/moving_mean'))
        _set(batch_stats, our_path + ('BatchNorm_0', 'var'),
             get(f'{tf_scope}/BatchNorm/moving_variance'))

    pc_params: Dict = {}
    for tf_scope, our_path in pc_name_pairs():
        _set(pc_params, our_path + ('w',), get(f'{tf_scope}/weights'))
        _set(pc_params, our_path + ('b',), get(f'{tf_scope}/biases'))

    return {'ae': ae_params, 'pc': pc_params}, batch_stats


def export_tensors(params, batch_stats, ae_config) -> Dict[str, np.ndarray]:
    """Our trees -> {tf1_variable_name: value} under the reference's exact
    naming scheme. The full inverse mapping, shared by export_tf1_checkpoint
    and the name-inventory fixture test (which pins this dict's keys+shapes
    against an inventory derived independently from the reference source —
    so a scope-name or shape mistake fails in CI, not the day the released
    checkpoints become available)."""

    def getp(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    tensors = {'autoencoder/encoder/centers': getp(params, ('ae', 'encoder', 'centers'))}
    for tf_scope, our_path, is_transpose in ae_name_pairs(ae_config):
        w = getp(params, ('ae',) + our_path + ('w',))
        if is_transpose:
            w = np.transpose(w, (0, 1, 3, 2))
        tensors[f'{tf_scope}/weights'] = w
        tensors[f'{tf_scope}/BatchNorm/gamma'] = getp(
            params, ('ae',) + our_path + ('BatchNorm_0', 'scale'))
        tensors[f'{tf_scope}/BatchNorm/beta'] = getp(
            params, ('ae',) + our_path + ('BatchNorm_0', 'bias'))
        tensors[f'{tf_scope}/BatchNorm/moving_mean'] = getp(
            batch_stats, our_path + ('BatchNorm_0', 'mean'))
        tensors[f'{tf_scope}/BatchNorm/moving_variance'] = getp(
            batch_stats, our_path + ('BatchNorm_0', 'var'))
    for tf_scope, our_path in pc_name_pairs():
        tensors[f'{tf_scope}/weights'] = getp(params, ('pc',) + our_path + ('w',))
        tensors[f'{tf_scope}/biases'] = getp(params, ('pc',) + our_path + ('b',))
    return tensors


def export_tf1_checkpoint(params, batch_stats, ae_config, out_prefix: str) -> str:
    """Inverse mapping (testing aid + migration tool): write our trees as a
    TF checkpoint with the reference's variable names."""
    import tensorflow as tf

    tensors = export_tensors(params, batch_stats, ae_config)

    # Write with exact variable names via the raw SaveV2 op (tf.train.
    # Checkpoint would mangle the names).
    names = sorted(tensors)
    tf.raw_ops.SaveV2(prefix=out_prefix,
                      tensor_names=names,
                      shape_and_slices=[''] * len(names),
                      tensors=[tf.constant(tensors[n]) for n in names])
    return out_prefix
