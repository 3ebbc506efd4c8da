"""Text cleanup functions (semantics of hepcrawl/inputs.py:31-137)."""

from __future__ import annotations

import re

_SUB_RE = re.compile(r"<(sub|inf)>(.*?)</\1>")
_SUP_RE = re.compile(r"<sup>(.*?)</sup>")


def convert_html_subscripts_to_latex(text: str) -> str:
    """``<sub>x</sub>``/``<inf>x</inf>`` -> ``$_{x}$``; ``<sup>y</sup>`` ->
    ``$^{y}$`` (reference: hepcrawl/inputs.py:31-36)."""
    text = _SUB_RE.sub(lambda m: "$_{%s}$" % m.group(2), text)
    return _SUP_RE.sub(lambda m: "$^{%s}$" % m.group(1), text)


def remove_tags(text: str, which_ones: tuple[str, ...] = (), keep: tuple[str, ...] = ()) -> str:
    """Strip HTML tags, keeping content.

    ``which_ones`` limits removal to those tags; ``keep`` protects tags
    (e.g. MathML) from a remove-all
    (reference: hepcrawl/inputs.py:39-43; keep-list hepcrawl/mappings.py:73-80).
    """
    if which_ones and keep:
        raise ValueError("which_ones and keep are exclusive")

    def _should_remove(tag: str) -> bool:
        name = tag.strip("</ >").split()[0].lower() if tag.strip("</ >") else ""
        if which_ones:
            return name in which_ones
        return name not in keep

    return re.sub(r"</?[A-Za-z][^>]*>",
                  lambda m: "" if _should_remove(m.group(0)) else m.group(0),
                  text)


def remove_tags_with_content(text: str, which_ones: tuple[str, ...] = ()) -> str:
    """Remove tags AND their content (reference: hepcrawl/inputs.py:93-99
    usage for ``<label>`` prefixes in affiliations)."""
    for tag in which_ones:
        text = re.sub(rf"<{tag}\b[^>]*>.*?</{tag}>", "", text, flags=re.S)
    return text


def clean_whitespace_characters(text: str) -> str:
    """Collapse all whitespace runs to single spaces and trim
    (reference: hepcrawl/inputs.py:106-113)."""
    return " ".join(text.split())


def clean_collaborations(value: str) -> str:
    """Strip a leading "for the" prefix
    (reference: hepcrawl/inputs.py:100-104)."""
    return value.replace("for the", "").strip()


# ISO-639-1/2 subset -> English name (reference: hepcrawl/mappings.py:82-121)
LANGUAGES = {
    "de": "German", "deu": "German", "ger": "German",
    "es": "Spanish", "spa": "Spanish",
    "fr": "French", "fra": "French", "fre": "French",
    "it": "Italian", "ita": "Italian",
    "ja": "Japanese", "jpn": "Japanese",
    "pt": "Portuguese", "por": "Portuguese",
    "ru": "Russian", "rus": "Russian",
    "zh": "Chinese", "zho": "Chinese", "chi": "Chinese",
    "nl": "Dutch", "dut": "Dutch", "nld": "Dutch",
    "pl": "Polish", "pol": "Polish",
    "ko": "Korean", "kor": "Korean",
}
_ENGLISH = {"en", "eng", "english"}


def translate_language(lang: str) -> str | None:
    """ISO code -> language name; English returns None
    (reference: hepcrawl/inputs.py:115-123)."""
    low = lang.lower()
    if low in _ENGLISH:
        return None
    return LANGUAGES.get(low, lang.title())
