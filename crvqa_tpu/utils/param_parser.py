"""The "k=v,k2=v2" mini-DSL used by `--masking_scheduler_conf`
(`utils/param_parser.py:dict_parser` in the reference)."""
from __future__ import annotations


def _coerce(v: str):
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return v


def dict_parser(s: str | None) -> dict:
    """Parse 'lambdas_lr=0,sparsity_warmup=automated_gradual_sparsity,...'."""
    if not s:
        return {}
    out = {}
    for item in s.split(","):
        if not item.strip():
            continue
        k, _, v = item.partition("=")
        out[k.strip()] = _coerce(v.strip())
    return out
