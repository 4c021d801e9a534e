"""The color-operations DSL: parser, logical plan, and fused compiler.

Grammar (pinned to /root/reference/rio_color/operations.py:207-286 and its
tests):

    "OP BANDS ARG [ARG] OP BANDS ARG ..."

- commas are optional whitespace (operations.py:229)
- an op-name token starts a new group (operations.py:232-239)
- BANDS chars come from r/g/b (case-insensitive) or digits 1-3, any combo
  (``Rg`` == ``1,2``); out-of-range digits raise
  ``"{op} BAND must be between 1 and 3"`` (operations.py:266-269)
- ``saturation`` is an RGB-space op: its "BANDS" token is really its first
  numeric argument (operations.py:252-255)
- unknown op → ``"{name} is not a valid operation"`` (operations.py:249-250)
- all args parse as float (operations.py:273)

This module is the engine's logical-plan layer: ``parse_ops_spec`` produces
a declarative list of :class:`OpSpec`; ``parse_operations`` wraps them as
composable ndarray closures (API parity with the reference);
``compile_chain`` fuses the whole chain into ONE function with a single
array copy — our whole-stage-codegen analogue, which removes the
reference's n+1 per-op block materializations (operations.py:192).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from rio_color_spark.functions import operations as _ops

_BAND_ALIASES = {"r": 1, "g": 2, "b": 3}
_N_BANDS = 3

#: op name → (underlying kernel, positional kwarg names, is-rgb-space-op)
_OP_TABLE = {
    "gamma": (_ops.gamma, ("g",), False),
    "sigmoidal": (_ops.sigmoidal, ("contrast", "bias"), False),
    "saturation": (_ops.saturation, ("proportion",), True),
}


@dataclass(frozen=True)
class OpSpec:
    """One parsed DSL operation — a node in the logical plan."""

    name: str
    bands: tuple[int, ...]  # 1-indexed; (1, 2, 3) for rgb-space ops
    kwargs: dict = field(default_factory=dict)
    rgb_op: bool = False

    def apply(self, arr: np.ndarray) -> np.ndarray:
        """Apply this op out-of-place (reference closure semantics)."""
        out = arr.copy()
        self.apply_into(arr, out)
        return out

    def apply_into(self, src: np.ndarray, dst: np.ndarray) -> None:
        """Apply this op reading band inputs from ``src``, writing ``dst``.

        ``src`` and ``dst`` may alias: every kernel consumes its input bands
        wholly before the assignment writes them back.
        """
        func = _OP_TABLE[self.name][0]
        if self.rgb_op:
            dst[0:3] = func(np.ascontiguousarray(src[0:3]), **self.kwargs)
        else:
            for b in self.bands:
                dst[b - 1] = func(src[b - 1], **self.kwargs)


def _parse_bands(opname: str, bandstr: str) -> tuple[int, ...]:
    bands: set[int] = set()
    for ch in bandstr:
        if ch.isdigit():
            band = int(ch)
        else:
            try:
                band = _BAND_ALIASES[ch.lower()]
            except KeyError:
                raise ValueError(
                    f"{opname} BAND must be between 1 and {_N_BANDS}"
                )
        if band < 1 or band > _N_BANDS:
            raise ValueError(f"{opname} BAND must be between 1 and {_N_BANDS}")
        bands.add(band)
    return tuple(sorted(bands))


def parse_ops_spec(ops_string: str) -> list[OpSpec]:
    """Parse a DSL string into the logical plan (list of :class:`OpSpec`)."""
    tokens = [t.strip() for t in ops_string.replace(",", "").split(" ")]

    groups: list[list[str]] = []
    current: list[str] = []
    for token in tokens:
        if token.lower() in _OP_TABLE:
            if current:
                groups.append(current)
                current = []
        current.append(token.lower())
    if current:
        groups.append(current)

    plan: list[OpSpec] = []
    for parts in groups:
        opname, rest = parts[0], parts[1:]
        if opname not in _OP_TABLE:
            raise ValueError(f"{opname} is not a valid operation")
        _, kwarg_names, rgb_op = _OP_TABLE[opname]

        if rgb_op:
            # the "BANDS" slot is actually the first numeric arg
            arg_tokens = rest
            bands = (1, 2, 3)
        else:
            arg_tokens = rest[1:]
            bands = _parse_bands(opname, rest[0])

        args = [float(a) for a in arg_tokens]
        plan.append(
            OpSpec(
                name=opname,
                bands=bands,
                kwargs=dict(zip(kwarg_names, args)),
                rgb_op=rgb_op,
            )
        )
    return plan


def parse_operations(ops_string: str):
    """Parse the DSL into a list of ndarray → ndarray callables.

    API-parity entry point mirroring the reference: each callable copies its
    input (no mutation) and carries ``__name__ == opname``.
    """
    fns = []
    for spec in parse_ops_spec(ops_string):
        def f(arr, _spec=spec):
            return _spec.apply(arr)

        f.__name__ = spec.name
        fns.append(f)
    return fns


def compile_chain(ops_string: str):
    """Fuse a whole DSL chain into one function with a single copy.

    Returns ``fused(arr) -> ndarray``: semantically identical to folding the
    ``parse_operations`` closures, but materializes exactly one output array
    regardless of chain length. This is what the Spark color operator ships
    to executors.
    """
    plan = parse_ops_spec(ops_string)

    def fused(arr: np.ndarray) -> np.ndarray:
        out = arr.copy()
        for spec in plan:
            spec.apply_into(out, out)
        return out

    fused.plan = plan
    return fused
