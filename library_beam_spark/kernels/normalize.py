"""T1 — text normalization (reference: AbstractNormalizer, NLP.py:164-223).

greek→latin transliteration, whitespace collapse, ASCII folding.
Pure functions; the column-level twin lives in functions/text.py.
"""

from __future__ import annotations

import re
import unicodedata

GREEK_MAP = {
    "α": "alpha", "β": "beta", "γ": "gamma", "δ": "delta", "ε": "epsilon",
    "ζ": "zeta", "η": "eta", "θ": "theta", "ι": "iota", "κ": "kappa",
    "λ": "lambda", "μ": "mu", "ν": "nu", "ξ": "xi", "ο": "omicron",
    "π": "pi", "ρ": "rho", "σ": "sigma", "ς": "sigma", "τ": "tau",
    "υ": "upsilon", "φ": "phi", "χ": "chi", "ψ": "psi", "ω": "omega",
    "Α": "Alpha", "Β": "Beta", "Γ": "Gamma", "Δ": "Delta", "Ε": "Epsilon",
    "Ζ": "Zeta", "Η": "Eta", "Θ": "Theta", "Ι": "Iota", "Κ": "Kappa",
    "Λ": "Lambda", "Μ": "Mu", "Ν": "Nu", "Ξ": "Xi", "Ο": "Omicron",
    "Π": "Pi", "Ρ": "Rho", "Σ": "Sigma", "Τ": "Tau", "Υ": "Upsilon",
    "Φ": "Phi", "Χ": "Chi", "Ψ": "Psi", "Ω": "Omega",
}

_GREEK_RE = re.compile("|".join(GREEK_MAP))
_WS_RE = re.compile(r"\s\s+")


def transliterate_greek(text: str) -> str:
    return _GREEK_RE.sub(lambda m: GREEK_MAP[m.group(0)], text)


def collapse_whitespace(text: str) -> str:
    return _WS_RE.sub(" ", text)


def ascii_fold(text: str) -> str:
    """unidecode-lite: NFKD decompose + strip non-ASCII."""
    return unicodedata.normalize("NFKD", text).encode("ascii", "ignore").decode("ascii")


def normalize(text: str) -> str:
    """Full T1 pipeline: greek → collapse → ascii-fold."""
    return ascii_fold(collapse_whitespace(transliterate_greek(text)))
