"""PHP-parity scalar cleaning expressions (the engine's scalar function lib).

Reference semantics: `src/Service/Mapper/Mapper.php:19-50` of the reference
repo — `asinValidate` (:19-27), `cleanString` (:29-32), `cleanUpc` (:34-37),
`cleanInteger` (:39-42), `cleanFloat` (:44-50). Re-expressed as pure
`pyspark.sql.Column` expressions (JVM-side, whole-stage-codegen'd — NO Python
UDFs), so they vectorize and survive 100 TB scans.

ANSI-proof: malformed casts use ``try_cast`` so semantics match PHP
(intval/floatval never throw) regardless of ``spark.sql.ansi.enabled``.

PHP quirks reproduced deliberately:
  * ``cleanString`` regex ``/[^a-zа-я\\d.]/ui`` — case-insensitive Latin +
    Cyrillic + digits + dot survive; everything else is stripped.
  * ``floatval`` parses the *leading* float: ``"1.2.3" → 1.2``, ``"" → 0.0``.
  * ``intval`` of empty string → 0.
  * asin failing ``^[A-Z0-9]{10}$`` after upper+trim → NULL (not dropped).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# PHP /[^a-zа-я\d.]/ui — explicit both-case classes so the Java regex needs no
# flags and an ANSI-SQL oracle can use the identical class.
_CLEAN_KEEP_RE = r"[^a-zA-Zа-яА-Я0-9.]"
# Leading-float extraction ≈ PHP floatval(): digits, optional dot, digits.
_LEADING_FLOAT_RE = r"^([0-9]*\.?[0-9]*)"


def _s(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("string")


def clean_string(c: Column | str) -> Column:
    """Strip every char except Latin/Cyrillic letters, digits and ``.``."""
    return F.regexp_replace(_s(c), _CLEAN_KEEP_RE, "")


def clean_upc(c: Column | str) -> Column:
    """``cleanString`` then truncate to 13 chars (string-typed key)."""
    return F.substring(clean_string(c), 1, 13)


def clean_integer(c: Column | str) -> Column:
    """Strip non-digits → long; empty/overflow → 0 (PHP intval('') == 0)."""
    digits = F.regexp_replace(_s(c), "[^0-9]", "")
    return F.coalesce(digits.try_cast("long"), F.lit(0).cast("long"))


def clean_float(c: Column | str) -> Column:
    """``,``→``.``, strip to ``[0-9.]``, parse leading float; empty → 0.0.

    ``cast("double")`` alone would turn multi-dot strings (``"1.2.3"``) into
    NULL where PHP floatval yields 1.2 — hence the leading-float extract.
    """
    normalized = F.regexp_replace(
        clean_string(F.translate(_s(c), ",", ".")), r"[^0-9.]", ""
    )
    leading = F.regexp_extract(normalized, _LEADING_FLOAT_RE, 1)
    return F.coalesce(leading.try_cast("double"), F.lit(0.0))


def asin_validate(c: Column | str) -> Column:
    """Upper+trim; must match ``^[A-Z0-9]{10}$`` else NULL."""
    t = F.upper(F.trim(_s(c)))
    return F.when(t.rlike("^[A-Z0-9]{10}$"), t).otherwise(F.lit(None).cast("string"))


# Name-dispatched cleaning, mirroring the reference's `switch ($targetField)`
# (Mapper.php:95-111): cleaning is chosen by TARGET column name, not by type.
NAME_DISPATCH = {
    "asin": asin_validate,
    "upc": clean_upc,
    "qty": clean_integer,
    "price": clean_float,
}


def clean_for_target(target: str, c: Column | str) -> Column:
    """Apply the reference's per-target-name cleaning; default passthrough."""
    fn = NAME_DISPATCH.get(target)
    if fn is None:
        c = F.col(c) if isinstance(c, str) else c
        return c
    return fn(c)
