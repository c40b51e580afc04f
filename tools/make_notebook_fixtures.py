"""Generate the committed notebook fixtures under data/notebooks/.

Two nbformat-4 notebooks closed-form in (b, i), exercising BOTH legal
``source`` spellings (string vs list-of-lines), code + markdown
cells, outputs (which must be counted, not ingested), execution
counts, and null execution counts:

  * nb{b}.ipynb, b ∈ {0,1}: language 'python', cells i = 0..3;
    even i → code cell with i+1 lines "x{b} = {i}" (list-of-lines
    spelling for b=0, single-string for b=1), execution_count i+1
    and i%4==2 ? 2 outputs : 1 output;
    odd i → markdown cell "# head {i}\\nbody {b}" (no outputs, null
    execution count).
  * broken.ipynb: not JSON — one _corrupt row.

Each code line is "x{b} = {i}\\n" = 7 chars + newline → closed-form
n_chars = 8·(i+1), n_lines = i+1.  Markdown n_chars = 16.
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "notebooks")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for b in range(2):
        cells = []
        for i in range(4):
            if i % 2 == 0:
                lines = [f"x{b} = {i}\n" for _ in range(i + 1)]
                src = lines if b == 0 else "".join(lines)
                cells.append({
                    "cell_type": "code",
                    "source": src,
                    "execution_count": i + 1,
                    "metadata": {},
                    "outputs": (
                        [{"output_type": "stream", "text": "a"},
                         {"output_type": "stream", "text": "b"}]
                        if i % 4 == 2
                        else [{"output_type": "stream", "text": "a"}]
                    ),
                })
            else:
                cells.append({
                    "cell_type": "markdown",
                    "source": f"# head {i}\nbody {b}",
                    "metadata": {},
                })
        nb = {
            "nbformat": 4, "nbformat_minor": 5,
            "metadata": {"language_info": {"name": "python"}},
            "cells": cells,
        }
        path = os.path.join(OUT, f"nb{b}.ipynb")
        with open(path, "w", newline="\n") as fh:
            json.dump(nb, fh, sort_keys=True)
        print("wrote", path)
    path = os.path.join(OUT, "broken.ipynb")
    with open(path, "w") as fh:
        fh.write("{not valid json")
    print("wrote", path)


if __name__ == "__main__":
    main()
