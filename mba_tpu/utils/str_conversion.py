"""String helpers (reference ``src/utils/str_conversion.py``)."""
from __future__ import annotations


def str_to_float(value: str) -> float:
    """Parse German-format numbers ('1.234,56' → 1234.56) and plain floats.

    Parity: reference str_conversion.py:1-13.
    """
    s = str(value).strip()
    if "," in s:
        s = s.replace(".", "").replace(",", ".")
    return float(s)


def enter_line_breaks(text: str, max_line_length: int = 60,
                      break_char: str = "\n") -> str:
    """Insert line breaks at word boundaries so no line exceeds the limit.

    Parity: reference str_conversion.py:16-45.
    """
    words = text.split(" ")
    lines: list[str] = []
    current = ""
    for word in words:
        candidate = word if not current else current + " " + word
        if len(candidate) > max_line_length and current:
            lines.append(current)
            current = word
        else:
            current = candidate
    if current:
        lines.append(current)
    return break_char.join(lines)
