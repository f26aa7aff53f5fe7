"""Config DSL loader.

Parses the text-based experiment-config DSL used by the reference framework
(see /root/reference `ae_configs/`, `pc_configs/`; parsed there by
``fjcommon.config_parser.parse``, ref ``train.py:65-66``). The DSL:

- ``# comment`` lines and inline comments.
- ``use <relpath>``: single inheritance. The path is resolved relative to the
  directory of the file containing the ``use`` statement. A child overrides
  parent values.
- ``constrain <key> :: A, B, C``: declares an enum constraint for ``key``.
  Constrained keys take bare-identifier values which are stored as strings.
- ``<key> = <expr>``: for unconstrained keys, ``<expr>`` is evaluated as a
  Python expression (numbers, tuples, strings, arithmetic like ``2*0.6``).
  Previously-assigned keys are visible in the expression namespace.

``parse(path, base_dir=None)`` returns ``(Config, rel_path)`` where
``rel_path`` is ``path`` relative to ``base_dir`` (mirroring the reference's
convention of naming log dirs by the config's path relative to the config
root, ref ``logdir_helpers.py:34-56``).
"""

from __future__ import annotations

import ast
import os
import re
from typing import Any, Dict, List, Optional, Tuple


class ConfigError(ValueError):
    pass


class Config:
    """Attribute-access view over parsed key/value pairs."""

    def __init__(self, values: Dict[str, Any], constraints: Dict[str, List[str]],
                 rel_path: Optional[str] = None, sources: Optional[List[str]] = None):
        object.__setattr__(self, '_values', dict(values))
        object.__setattr__(self, '_constraints', dict(constraints))
        object.__setattr__(self, 'rel_path', rel_path)
        object.__setattr__(self, 'sources', list(sources or []))

    def __getattr__(self, name: str) -> Any:
        values = object.__getattribute__(self, '_values')
        if name in values:
            return values[name]
        raise AttributeError(f'Config has no key {name!r}. Keys: {sorted(values)}')

    def __setattr__(self, name: str, value: Any) -> None:
        self._values[name] = value

    def __contains__(self, name: str) -> bool:
        return name in self._values

    def get(self, name: str, default: Any = None) -> Any:
        return self._values.get(name, default)

    def keys(self):
        return self._values.keys()

    def items(self):
        return self._values.items()

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._values)

    def replace(self, **updates: Any) -> 'Config':
        values = dict(self._values)
        values.update(updates)
        return Config(values, self._constraints, self.rel_path, self.sources)

    def __repr__(self) -> str:
        body = '\n'.join(f'{k} = {v!r}' for k, v in sorted(self._values.items()))
        return f'Config({self.rel_path}):\n{body}'


_USE_RE = re.compile(r'^use\s+(\S+)\s*$')
_CONSTRAIN_RE = re.compile(r'^constrain\s+(\w+)\s*::\s*(.+)$')
_ASSIGN_RE = re.compile(r'^(\w+)\s*=\s*(.+)$')

_SAFE_EVAL_GLOBALS = {'__builtins__': {}, 'True': True, 'False': False, 'None': None}


def _strip_comment(line: str) -> str:
    # Strip an inline comment, but not a '#' inside a string literal.
    out = []
    in_str: Optional[str] = None
    for ch in line:
        if in_str:
            out.append(ch)
            if ch == in_str:
                in_str = None
        elif ch in ('"', "'"):
            in_str = ch
            out.append(ch)
        elif ch == '#':
            break
        else:
            out.append(ch)
    return ''.join(out).strip()


def _eval_expr(expr: str, namespace: Dict[str, Any]) -> Any:
    try:
        return ast.literal_eval(expr)
    except (ValueError, SyntaxError):
        pass
    try:
        return eval(expr, dict(_SAFE_EVAL_GLOBALS), dict(namespace))  # noqa: S307
    except Exception as e:
        raise ConfigError(f'Cannot evaluate expression {expr!r}: {e}') from e


def _parse_file(path: str, values: Dict[str, Any], constraints: Dict[str, List[str]],
                sources: List[str]) -> None:
    path = os.path.abspath(path)
    if not os.path.isfile(path):
        raise ConfigError(f'Config file not found: {path}')
    sources.append(path)
    with open(path, 'r') as f:
        lines = f.readlines()

    # First pass: resolve `use` (must come before it is overridden).
    pending: List[Tuple[str, str]] = []
    for raw in lines:
        line = _strip_comment(raw)
        if not line:
            continue
        m = _USE_RE.match(line)
        if m:
            parent = os.path.normpath(os.path.join(os.path.dirname(path), m.group(1)))
            _parse_file(parent, values, constraints, sources)
            continue
        m = _CONSTRAIN_RE.match(line)
        if m:
            key = m.group(1)
            options = [o.strip() for o in m.group(2).split(',')]
            constraints[key] = options
            continue
        m = _ASSIGN_RE.match(line)
        if m:
            pending.append((m.group(1), m.group(2).strip()))
            continue
        raise ConfigError(f'Cannot parse line in {path}: {raw.rstrip()}')

    for key, rhs in pending:
        if key in constraints:
            value = rhs.strip('\'"')
            if value not in constraints[key]:
                raise ConfigError(
                    f'{path}: {key} = {value!r} violates constrain :: {constraints[key]}')
            values[key] = value
        else:
            values[key] = _eval_expr(rhs, values)


def parse(path: str, base_dir: Optional[str] = None) -> Tuple[Config, str]:
    """Parse a config file; returns (Config, rel_path)."""
    values: Dict[str, Any] = {}
    constraints: Dict[str, List[str]] = {}
    sources: List[str] = []
    _parse_file(path, values, constraints, sources)
    if base_dir is not None:
        rel_path = os.path.relpath(os.path.abspath(path), os.path.abspath(base_dir))
    else:
        rel_path = _default_rel_path(path)
    cfg = Config(values, constraints, rel_path=rel_path, sources=sources)
    return cfg, rel_path


def _default_rel_path(path: str) -> str:
    """Path relative to the enclosing 'ae'/'pc'/'ae_configs'/'pc_configs' root, if any."""
    parts = os.path.abspath(path).split(os.sep)
    for marker in ('ae', 'pc', 'ae_configs', 'pc_configs'):
        if marker in parts:
            i = len(parts) - 1 - parts[::-1].index(marker)
            return os.path.join(*parts[i + 1:]) if i + 1 < len(parts) else parts[-1]
    return os.path.basename(path)


def default_config_root() -> str:
    """Root of the configs bundled with this package."""
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'configs')


def resolve_config_path(spec: str, kind: str) -> str:
    """Resolve a config spec to a file path.

    ``spec`` may be an absolute/relative existing path, or a name relative to
    the bundled config root (e.g. ``cvpr/low`` with ``kind='ae'``). The env
    vars ``CONFIG_BASE_AE`` / ``CONFIG_BASE_PC`` override the bundled root
    (same convention as the reference's ``constants.py:1-15``).
    """
    assert kind in ('ae', 'pc')
    if os.path.isfile(spec):
        return os.path.abspath(spec)
    env = os.environ.get('CONFIG_BASE_AE' if kind == 'ae' else 'CONFIG_BASE_PC')
    roots = []
    if env:
        roots.append(env)
    roots.append(os.path.join(default_config_root(), kind))
    for root in roots:
        cand = os.path.join(root, spec)
        if os.path.isfile(cand):
            return cand
    raise ConfigError(f'Cannot resolve {kind} config {spec!r}; looked in {roots}')


def parse_spec(spec: str, kind: str) -> Tuple[Config, str]:
    path = resolve_config_path(spec, kind)
    env = os.environ.get('CONFIG_BASE_AE' if kind == 'ae' else 'CONFIG_BASE_PC')
    base = env if env and os.path.abspath(path).startswith(os.path.abspath(env)) \
        else os.path.join(default_config_root(), kind)
    return parse(path, base_dir=base)
