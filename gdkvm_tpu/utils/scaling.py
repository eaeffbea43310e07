"""Predictable-Scale calculator: optimal batch size & learning rate.

Re-implements the reference website's tool-page capability (reference:
website/src/scripts/tool.ts:8-15 — the documented scaling-law formulas, and
:96-121 — liberal numeric input parsing) as a library + CLI:

    bs(D)    = 0.58 · D^0.571
    lr(N, D) = 1.79 · N^−0.713 · D^0.307

with N = model parameters, D = training tokens (both counts).  The batch
size is token-wise; divide by sequence length for a sequence-wise batch.
"""

from __future__ import annotations

import math
import re
from typing import Dict, Union

Number = Union[int, float, str]


def parse_count(value: Number) -> float:
    """Parse liberal numeric notations: 1e8, 3.5×10^6, 2*10^7, 1_000_000."""
    if isinstance(value, (int, float)):
        out = float(value)
    else:
        s = value.strip().replace(",", "").replace("_", "")
        s = s.replace("×", "*").replace("x", "*").replace("X", "*")
        s = s.replace("^", "**")
        if not re.fullmatch(r"[0-9eE+\-.*() ]+", s):
            raise ValueError(f"cannot parse numeric input {value!r}")
        try:
            out = float(eval(s, {"__builtins__": {}}, {}))  # arithmetic only
        except Exception as exc:
            raise ValueError(f"cannot parse numeric input {value!r}") from exc
    if not math.isfinite(out) or out <= 0:
        raise ValueError(f"value must be a positive finite number, "
                         f"got {value!r}")
    return out


def optimal_bs_lr(model_params: Number, tokens: Number) -> Dict[str, float]:
    """Token-wise optimal batch size and learning rate (documented laws)."""
    n = parse_count(model_params)
    d = parse_count(tokens)
    log_bs = math.log(0.58) + 0.571 * math.log(d)
    log_lr = math.log(1.79) - 0.713 * math.log(n) + 0.307 * math.log(d)
    return {
        "batch_size_tokens": math.exp(log_bs),
        "learning_rate": math.exp(log_lr),
        "model_params": n,
        "tokens": d,
    }
