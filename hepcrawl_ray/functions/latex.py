"""LaTeX -> plain-text conversion (semantics of the reference's
LatexNodes2Text usage, reference: hepcrawl/parsers/arxiv.py:49-91).

The reference builds a custom macro database once per process
(expensive class-level init) with a special ``\\sqrt`` handler and
unknown-macro passthrough.  This is a small deterministic converter
with the same contract: greek/symbol macros map to unicode, ``\\sqrt``
renders a radical, sub/superscripts flatten, unknown macros pass
through as their name (never an exception).  Compile-once module state
plays the role of the cached macro DB (use inside an actor-pool UDF).
"""

from __future__ import annotations

import re

GREEK = {
    "alpha": "α", "beta": "β", "gamma": "γ", "delta": "δ", "epsilon": "ε",
    "zeta": "ζ", "eta": "η", "theta": "θ", "iota": "ι", "kappa": "κ",
    "lambda": "λ", "mu": "μ", "nu": "ν", "xi": "ξ", "pi": "π", "rho": "ρ",
    "sigma": "σ", "tau": "τ", "upsilon": "υ", "phi": "φ", "chi": "χ",
    "psi": "ψ", "omega": "ω",
    "Gamma": "Γ", "Delta": "Δ", "Theta": "Θ", "Lambda": "Λ", "Xi": "Ξ",
    "Pi": "Π", "Sigma": "Σ", "Upsilon": "Υ", "Phi": "Φ", "Psi": "Ψ",
    "Omega": "Ω",
}
SYMBOLS = {
    "times": "×", "pm": "±", "mp": "∓", "to": "→", "rightarrow": "→",
    "leftarrow": "←", "infty": "∞", "approx": "≈", "sim": "~",
    "leq": "≤", "geq": "≥", "neq": "≠", "cdot": "·", "ell": "ℓ",
    "hbar": "ℏ", "partial": "∂", "nabla": "∇", "sum": "∑", "int": "∫",
    "prod": "∏", "dagger": "†", "circ": "∘", "prime": "′",
}
_MACROS = {**GREEK, **SYMBOLS}

_SQRT_RE = re.compile(r"\\sqrt\s*\{([^{}]*)\}")
_MACRO_RE = re.compile(r"\\([A-Za-z]+)")
_SCRIPT_RE = re.compile(r"[\^_]\{([^{}]*)\}")
_BARE_SCRIPT_RE = re.compile(r"[\^_]([A-Za-z0-9])")


def latex_to_text(s: str) -> str:
    """Convert LaTeX-ish fragments to readable unicode text.

    - ``$...$`` delimiters dropped
    - ``\\sqrt{x}`` -> ``√(x)`` (the reference's custom handler analog)
    - greek/symbol macros -> unicode; UNKNOWN macros pass through as
      their bare name (reference keeps unknown macros,
      hepcrawl/parsers/arxiv.py:60-71)
    - ``^{x}`` / ``_{x}`` / ``^x`` / ``_x`` flatten to their content
    - braces dropped, whitespace collapsed
    """
    s = s.replace("$", "")
    s = _SQRT_RE.sub(lambda m: "√(" + m.group(1) + ")", s)
    s = _MACRO_RE.sub(lambda m: _MACROS.get(m.group(1), m.group(1)), s)
    s = _SCRIPT_RE.sub(lambda m: m.group(1), s)
    s = _BARE_SCRIPT_RE.sub(lambda m: m.group(1), s)
    s = s.replace("{", "").replace("}", "")
    return " ".join(s.split())
