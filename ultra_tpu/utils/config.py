"""Config system: jinja2-templated YAML with auto-generated CLI flags.

Mirrors the reference ergonomics (util.py:25-65): any undeclared
``{{ var }}`` in the YAML template becomes a required command-line flag;
values parse via ast.literal_eval so ``--gpus [0,1]`` or ``--bpe null``
work. easydict is replaced by a tiny attribute-dict.
"""

from __future__ import annotations

import argparse
import ast
import re
from typing import Tuple

import jinja2
from jinja2 import meta
import yaml


class AttrDict(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj


def detect_variables(cfg_file: str):
    """Undeclared jinja2 template variables (util.py:25-32)."""
    with open(cfg_file) as f:
        env = jinja2.Environment()
        ast_ = env.parse(f.read())
    return meta.find_undeclared_variables(ast_)


def load_config(cfg_file: str, context: dict | None = None) -> AttrDict:
    """Render the template with ``context`` and parse YAML (util.py:34-41)."""
    with open(cfg_file) as f:
        template = jinja2.Template(f.read())
    instance = template.render(context or {})
    cfg = yaml.safe_load(instance)
    return AttrDict.wrap(cfg)


def parse_args(
    parser: argparse.ArgumentParser | None = None,
    optional_vars: bool = False,
) -> Tuple[argparse.Namespace, dict]:
    """-c/--config, -s/--seed plus auto flags for template vars
    (util.py:44-65). ``optional_vars``: template vars become optional flags
    (unset ones render empty -> YAML null) — for CLIs like serve.py /
    visualize.py that reuse training configs but never read train.*."""
    parser = parser or argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True, help="yaml config file")
    parser.add_argument("-s", "--seed", type=int, default=1024, help="random seed")
    args, unparsed = parser.parse_known_args()

    vars_ = detect_variables(args.config)
    var_parser = argparse.ArgumentParser()
    for var in sorted(vars_):
        var_parser.add_argument(
            f"--{var}", required=not optional_vars,
            **({"default": None} if optional_vars else {}),
        )
    vars_ns = var_parser.parse_args(unparsed)
    vars_dict = {}
    for k, v in vars(vars_ns).items():
        if v is None:
            continue
        try:
            vars_dict[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            vars_dict[k] = v
    return args, vars_dict


def literal_eval_flags(values: dict) -> dict:
    out = {}
    for k, v in values.items():
        if isinstance(v, str):
            try:
                out[k] = ast.literal_eval(v)
                continue
            except (ValueError, SyntaxError):
                pass
        out[k] = v
    return out
