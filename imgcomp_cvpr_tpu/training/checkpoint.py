"""Checkpointing and restore logic (ref: saver.py, restore_manager.py).

Orbax-backed, with the reference's conventions preserved:

- layout ``<logdir>/ckpts/ckpt-<itr>`` (ref: saver.py:9-10,52-58);
- a ``var_names.json`` manifest in the ckpt dir recording exactly which
  variables this run saves (ref: saver.py:19-43) so restorers can build
  matching var lists;
- retention: keep the latest checkpoint plus one checkpoint every
  ``keep_every_n_hours`` (ref: train.py:189-191);
- ``restore_at_itr`` picks the latest ckpt with iteration <= itr
  (ref: saver.py:95-112);
- skip patterns on restore (e.g. 'Adam', 'global_step' — here: 'opt_state',
  'step') keep freshly-initialized values for matching subtrees
  (ref: restore_manager.py:17-30).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from os import path
from typing import Any, List, Optional, Sequence, Tuple

import flax.serialization
import jax
import numpy as np
import orbax.checkpoint as ocp

from ..utils import logdir as logdir_lib

CKPT_PREFIX = 'ckpt-'
VAR_NAMES_FILE = 'var_names.json'


def _flat_names(tree: Any) -> List[str]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(kp) for kp, _ in flat]


class Saver:
    def __init__(self, ckpt_dir: str, max_to_keep: int = 1,
                 keep_every_n_hours: float = 1.0):
        self.ckpt_dir = os.path.abspath(ckpt_dir)  # orbax requires absolute
        self.max_to_keep = max_to_keep
        self.keep_every_n_hours = keep_every_n_hours
        os.makedirs(ckpt_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()
        self._kept_times: List[Tuple[float, int]] = []  # (mtime, itr) of kept ckpts

    def save(self, state: Any, itr: int) -> str:
        p = path.join(self.ckpt_dir, f'{CKPT_PREFIX}{itr}')
        # Serialize as a plain nested dict so restore has a canonical
        # structure regardless of the caller's pytree (dataclass, dict, ...).
        state = flax.serialization.to_state_dict(jax.device_get(state))
        if path.exists(p):
            shutil.rmtree(p)
        self._ckptr.save(p, state)
        manifest = path.join(self.ckpt_dir, VAR_NAMES_FILE)
        if not path.exists(manifest):
            with open(manifest, 'w') as f:
                json.dump(_flat_names(state), f, indent=1)
        self._apply_retention()
        return p

    def _apply_retention(self) -> None:
        ckpts = all_ckpts_with_iterations(self.ckpt_dir)
        if len(ckpts) <= self.max_to_keep:
            return
        protect = {itr for itr, _ in ckpts[-self.max_to_keep:]}
        keep_s = self.keep_every_n_hours * 3600.0
        last_kept_time: Optional[float] = None
        for itr, p in ckpts:
            mtime = os.path.getmtime(p)
            if last_kept_time is None or mtime - last_kept_time >= keep_s:
                protect.add(itr)
                last_kept_time = mtime
        for itr, p in ckpts:
            if itr not in protect:
                shutil.rmtree(p, ignore_errors=True)

    def restore(self, itr: Optional[int] = None) -> Tuple[Any, int]:
        ckpts = all_ckpts_with_iterations(self.ckpt_dir)
        assert ckpts, f'No checkpoints in {self.ckpt_dir}'
        if itr is None or itr == -1:
            itr_found, p = ckpts[-1]
        else:
            candidates = [(i, p) for i, p in ckpts if i <= itr]
            assert candidates, f'No ckpt with itr <= {itr} in {self.ckpt_dir}'
            itr_found, p = candidates[-1]
        return self._ckptr.restore(p), itr_found

    def restore_into(self, template: Any, itr: Optional[int] = None) -> Tuple[Any, int]:
        """Restore with the pytree structure of ``template``."""
        raw, itr_found = self.restore(itr)
        return flax.serialization.from_state_dict(template, raw), itr_found


def all_ckpts_with_iterations(ckpt_dir: str) -> List[Tuple[int, str]]:
    """Sorted (iteration, path) for every checkpoint in ckpt_dir
    (ref: saver.py:114-135)."""
    out = []
    if not path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(re.escape(CKPT_PREFIX) + r'(\d+)', name)
        if m:
            out.append((int(m.group(1)), path.join(ckpt_dir, name)))
    return sorted(out)


def iteration_of_checkpoint(ckpt_path: str) -> int:
    m = re.search(re.escape(CKPT_PREFIX) + r'(\d+)', path.basename(ckpt_path))
    assert m, ckpt_path
    return int(m.group(1))


def restore_tree(ckpt_path: str) -> Any:
    return ocp.PyTreeCheckpointer().restore(ckpt_path)


def merge_with_skip(init_tree: Any, restored_tree: Any,
                    skip_patterns: Sequence[str]) -> Any:
    """Overwrite init_tree leaves with restored values except those whose
    path matches any skip pattern (substring match, like the reference's
    --restore_skip_vars, ref: restore_manager.py:17-21)."""
    flat_init, treedef = jax.tree_util.tree_flatten_with_path(init_tree)
    flat_restored = dict(jax.tree_util.tree_flatten_with_path(restored_tree)[0])
    # Key paths differ in object identity; map by string.
    restored_by_name = {jax.tree_util.keystr(kp): v
                        for kp, v in jax.tree_util.tree_flatten_with_path(restored_tree)[0]}
    out_leaves = []
    for kp, init_val in flat_init:
        name = jax.tree_util.keystr(kp)
        if any(pat and pat in name for pat in skip_patterns):
            out_leaves.append(init_val)
            continue
        if name in restored_by_name:
            restored = restored_by_name[name]
            assert np.shape(restored) == np.shape(init_val), \
                f'{name}: {np.shape(restored)} vs {np.shape(init_val)}'
            out_leaves.append(jax.numpy.asarray(restored, init_val.dtype)
                              if hasattr(init_val, 'dtype') else restored)
        else:
            out_leaves.append(init_val)
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


class RestoreManager:
    """Parses --restore/--restore_itr/--restore_continue/--from_identity
    semantics (ref: restore_manager.py:4-37)."""

    def __init__(self, ckpt_dir: str, itr: Optional[int] = None,
                 continue_in_ckpt_dir: bool = False,
                 skip_vars: Sequence[str] = ()):
        self.ckpt_dir = ckpt_dir
        self.itr = itr
        self.continue_in_ckpt_dir = continue_in_ckpt_dir
        self.skip_vars = list(skip_vars)

    @property
    def log_dir(self) -> str:
        return logdir_lib.log_dir_from_ckpt_dir(self.ckpt_dir)

    @classmethod
    def from_flags(cls, flags) -> Optional['RestoreManager']:
        if getattr(flags, 'from_identity', None):
            # restore weights but re-init step and optimizer state
            return cls(flags.from_identity, itr=None, continue_in_ckpt_dir=False,
                       skip_vars=['opt_state', 'step'])
        if not getattr(flags, 'restore', None):
            return None
        skip = []
        if getattr(flags, 'restore_skip_vars', None):
            skip = [s.strip() for s in flags.restore_skip_vars.split(',')]
        itr = getattr(flags, 'restore_itr', -1)
        return cls(flags.restore, itr=None if itr == -1 else itr,
                   continue_in_ckpt_dir=bool(getattr(flags, 'restore_continue', False)),
                   skip_vars=skip)

    def restore(self, init_state: Any) -> Tuple[Any, int]:
        saver = Saver(self.ckpt_dir)
        restored_dict, itr = saver.restore(self.itr)
        init_dict = flax.serialization.to_state_dict(jax.device_get(init_state))
        merged_dict = merge_with_skip(init_dict, restored_dict, self.skip_vars)
        state = flax.serialization.from_state_dict(init_state, merged_dict)
        if any('step' in p for p in self.skip_vars):
            itr = 0
        return state, itr
