"""Real ORC file interop: read and write actual .orc files.

The reference's headline correctness claim is whole-file: "all files
from the examples given in the ORC repository work" and TPC-DS files
are processable (/root/reference/README.md:16-20, reader entry
/root/reference/src/Orc/Serial/Binary/Base.hs:78-159). This package is
the analog: a pure-Python ORC v1 file reader/writer over the same
codec kernels the Spark engine uses, cross-validated both directions
against pyarrow's bundled C++ ORC implementation — the same C++ ORC
that orc-haskell declares compatibility with
(/root/reference/optimised-row-columnar.cabal:8-11).

- reader: .orc (written by any conforming writer) -> pyarrow Table
- writer: pyarrow Table -> .orc readable by the C++ implementation
- spark_source: distributed stripe-parallel scan via mapInArrow
"""

from .reader import ORCFile, read_orc  # noqa: F401
