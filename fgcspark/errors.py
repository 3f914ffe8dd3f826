"""Error taxonomy (G16) and input-id normalization (S8).

Reference semantics:
- error_if/read_error_msg (reference R/err.R:11-35,39-47): raise
  "{msg}; err_name: {name}" and parse it back to {err_msg, err_name};
- sanitise_id (reference R/sanitise_id.R:11-29): digits-only input ->
  (file=int, name="HBF.<x>"); anything else ->
  (file="https://tun.fi/<x>", name=x).
"""

from __future__ import annotations

import re


class FgcError(Exception):
    """Engine error carrying a machine-readable err_name."""

    def __init__(self, msg: str, err_name: str):
        self.err_msg = msg
        self.err_name = err_name
        super().__init__(format_error(msg, err_name))


def format_error(msg: str, err_name: str) -> str:
    return f"{msg}; err_name: {err_name}"


def error_if(cond: bool, msg: str, err_name: str) -> None:
    if cond:
        raise FgcError(msg, err_name)


_ERR_RE = re.compile(r"^(?P<err_msg>.*); err_name: (?P<err_name>\S+)$", re.S)


def read_error_msg(s: str) -> dict[str, str]:
    """Parse '{msg}; err_name: {name}' back to its parts; unparseable
    strings become err_name='error' (reference read_error_msg fallback)."""
    m = _ERR_RE.match(s.strip())
    if not m:
        return {"err_msg": s.strip(), "err_name": "error"}
    return {"err_msg": m.group("err_msg"), "err_name": m.group("err_name")}


def sanitise_id(x: str) -> dict:
    """Reference R/sanitise_id.R:11-29."""
    if re.fullmatch(r"\d+", x):
        return {"file": int(x), "name": f"HBF.{x}"}
    return {"file": f"https://tun.fi/{x}", "name": x}


def conversion_id(name: str, request: str, salt: str = "") -> str:
    """G17 conversion-id hashing (reference api.R:89-93:
    `{name}-{xxhash32(req, rand)}`). Deterministic variant — the salt
    replaces the reference's random seed so resumable runs re-derive
    the same id for the same (name, request); pass a fresh salt for
    reference-faithful uniqueness."""
    import struct
    import zlib

    h = zlib.crc32(f"{request}\x00{salt}".encode()) & 0xFFFFFFFF
    return f"{name}-{struct.pack('>I', h).hex()}"


def sanitise_nms(names: list[str]) -> list[str]:
    """P2 column-name sanitization (reference
    R/finbif_geo_convert.R:97-105): whitespace -> '_', strip other
    non-word chars."""
    return [re.sub(r"\W", "", re.sub(r"\s", "_", n)) for n in names]
