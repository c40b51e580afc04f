"""Generate the committed EPUB fixtures under data/epub/.

Two books, closed-form in (b, i, j) so the q_epub_ingest oracle
recomputes everything in SQL: book b has title "Book {b}" and
chapters i = 0..2+b (href ch{i}.xhtml), chapter i holding paragraphs
j = 0..i of "para {j} of chapter {i} in book {b}" (29 chars each for
single digits → n_chars = (i+1)·29 + i newlines).

Deterministic output (zeroed zip timestamps) — rerunning reproduces
the committed bytes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from artis_data_ingest_spark.sources.epub import (  # noqa: E402
    write_minimal_epub,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "epub")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for b in range(2):
        chapters = []
        for i in range(3 + b):
            body = "".join(
                f"<p>para {j} of chapter {i} in book {b}</p>"
                for j in range(i + 1)
            )
            chapters.append((f"ch{i}.xhtml", body))
        blob = write_minimal_epub(f"Book {b}", chapters)
        path = os.path.join(OUT, f"book{b}.epub")
        with open(path, "wb") as fh:
            fh.write(blob)
        print("wrote", path)


if __name__ == "__main__":
    main()
