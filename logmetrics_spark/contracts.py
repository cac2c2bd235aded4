"""Engine-wide value-parse contracts (pure constants, no Spark).

Shared verbatim by the staged Catalyst exprs
(``operators/datapoints.py``), the fused pandas kernel
(``operators/fused.py``), and the sequential Python oracle
(``oracle.py``) — the three paths MUST parse identically:

- ASCII-only digit classes (``[0-9]``): Python/pandas ``\\d`` matches
  unicode digits ('٥٣'), Java's does not;
- int bodies capped at 18 digits — always exact in BOTH int64 and
  float64 (Python ``int()`` is unbounded, Spark ``try_cast`` overflows
  to NULL, pandas ``to_numeric`` degrades to lossy float64; 19+ digit
  bodies now uniformly fail to parse and drop the line);
- the strip set pinned to ASCII whitespace (Spark ``F.trim`` strips
  only spaces, Python ``.strip()`` strips unicode whitespace — both
  replaced by this explicit set);
- floats: plain decimal/scientific only — no '1_0' underscore
  separators, no 'inf'/'nan' words, no hex floats.
"""

STRIP_CHARS = " \t\r\n\f\v"
STRIP_RE = r"^[ \t\r\n\f\v]+|[ \t\r\n\f\v]+$"
INT_RE = r"[+-]?[0-9]{1,18}"
FLOAT_RE = r"[+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?"
