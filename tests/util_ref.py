"""Helpers to load pure-Python reference modules as test oracles.

The reference tree at /root/reference is used read-only, at test time only,
to check output parity of our from-scratch implementations.
"""
import importlib.util
import os
import sys

REF_ROOT = "/root/reference"


def load_ref_module(rel_path: str, name: str):
    path = os.path.join(REF_ROOT, rel_path)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_available() -> bool:
    return os.path.isdir(REF_ROOT)
