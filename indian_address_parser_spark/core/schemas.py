"""Entity label vocabulary and span record.

Parity target: reference ``src/address_parser/schemas.py:8-60``.
The 15-label vocabulary and the (label, value, start, end, confidence)
span shape are identical; we use a plain slotted class instead of
pydantic so the hot extraction path has no validation overhead inside
Arrow UDF batches.

Behavioural notes mirrored from the reference:
- pydantic's ``str_strip_whitespace`` strips ``value`` at construction
  time (``schemas.py:42-54``) → ``Span.make`` strips.
- ``model_copy(update=...)`` does NOT re-validate/strip → ``Span.copy``
  applies raw updates (this matters: the refiner can legally produce
  empty values mid-flight that a validator would reject).
"""

from __future__ import annotations

ENTITY_LABELS: tuple[str, ...] = (
    "AREA",
    "SUBAREA",
    "HOUSE_NUMBER",
    "SECTOR",
    "GALI",
    "COLONY",
    "BLOCK",
    "CAMP",
    "POLE",
    "KHASRA",
    "FLOOR",
    "PLOT",
    "PINCODE",
    "CITY",
    "STATE",
)

# BIO tag space (reference schemas.py:34-36): "O" + B-/I- per label = 31 tags.
BIO_LABELS: tuple[str, ...] = (
    ("O",)
    + tuple(f"B-{lab}" for lab in ENTITY_LABELS)
    + tuple(f"I-{lab}" for lab in ENTITY_LABELS)
)
LABEL2ID = {lab: i for i, lab in enumerate(BIO_LABELS)}
ID2LABEL = {i: lab for i, lab in enumerate(BIO_LABELS)}


class Span:
    """One extracted entity span. Mirrors reference ``AddressEntity``."""

    __slots__ = ("label", "value", "start", "end", "confidence")

    def __init__(self, label: str, value: str, start: int, end: int, confidence: float = 1.0):
        self.label = label
        self.value = value
        self.start = start
        self.end = end
        self.confidence = confidence

    @classmethod
    def make(cls, label: str, value: str, start: int, end: int, confidence: float = 1.0) -> "Span":
        """Construct with pydantic-equivalent whitespace stripping."""
        return cls(label, value.strip(), start, end, confidence)

    def copy(self, **updates) -> "Span":
        """Unvalidated copy-with-updates (pydantic ``model_copy`` parity)."""
        fields = {s: getattr(self, s) for s in self.__slots__}
        fields.update(updates)
        return Span(**fields)

    def as_dict(self) -> dict:
        return {
            "label": self.label,
            "value": self.value,
            "start": self.start,
            "end": self.end,
            "confidence": self.confidence,
        }

    def __eq__(self, other) -> bool:
        return isinstance(other, Span) and all(
            getattr(self, s) == getattr(other, s) for s in self.__slots__
        )

    def __repr__(self) -> str:
        return (
            f"Span({self.label!r}, {self.value!r}, {self.start}, {self.end}, "
            f"{self.confidence})"
        )
