"""Offline checkpoint surgery: rename/remap state entries between
checkpoints (the reference's save_mapper.py:40-58 migration utility).

Works on the flat state-dict representation: a mapping function receives
each flattened key path ('params/ae/encoder/h1/w', ...) and returns the new
path, or None to drop the entry.
"""

from __future__ import annotations

import argparse
from typing import Any, Callable, Dict, Optional

import numpy as np

from ..training import checkpoint as checkpoint_lib


def _flatten(tree: Any, prefix: str = '') -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f'{prefix}/{k}' if prefix else str(k)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[str, Any]) -> Any:
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split('/')
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def print_all_in_ckpt(ckpt_path: str) -> None:
    """(ref: save_mapper.py:10-15)"""
    tree = checkpoint_lib.restore_tree(ckpt_path)
    for name, value in sorted(_flatten(tree).items()):
        print(f'{name}  {np.shape(value)}  {np.asarray(value).dtype}')


def create_new_ckpt_with_name_mapping(
        ckpt_path: str, out_ckpt_dir: str, out_itr: int,
        map_name: Callable[[str], Optional[str]]) -> str:
    """(ref: save_mapper.py:40-58)"""
    tree = checkpoint_lib.restore_tree(ckpt_path)
    flat = _flatten(tree)
    new_flat = {}
    for name, value in flat.items():
        new_name = map_name(name)
        if new_name is None:
            print(f'drop: {name}')
            continue
        if new_name != name:
            print(f'{name} -> {new_name}')
        new_flat[new_name] = value
    saver = checkpoint_lib.Saver(out_ckpt_dir, max_to_keep=1000)
    return saver.save(_unflatten(new_flat), out_itr)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='cmd', required=True)
    show = sub.add_parser('show')
    show.add_argument('ckpt_path')
    ren = sub.add_parser('rename')
    ren.add_argument('ckpt_path')
    ren.add_argument('out_ckpt_dir')
    ren.add_argument('--itr', type=int, default=0)
    ren.add_argument('--sub', nargs=2, action='append', default=[],
                     metavar=('OLD', 'NEW'), help='substring replacement')
    flags = p.parse_args()
    if flags.cmd == 'show':
        print_all_in_ckpt(flags.ckpt_path)
    else:
        def map_name(name: str):
            for old, new in flags.sub:
                name = name.replace(old, new)
            return name
        create_new_ckpt_with_name_mapping(flags.ckpt_path, flags.out_ckpt_dir,
                                          flags.itr, map_name)


if __name__ == '__main__':
    main()
