"""Generate the committed XML fixtures under data/xml/.

MediaWiki-dump-shaped documents (default namespace included, so the
reader's namespace-insensitive path matching is actually exercised):
three files of four pages each, every field closed-form in (f, i) —
plus one deliberately TRUNCATED file whose salvageable prefix must
still yield its one complete page and a _corrupt sentinel row.

  * title      "Page {f}-{i}"
  * page id    100*f + i          rev id (attribute)  1000*f + i
  * timestamp  2024-03-0{i+1}T00:00:00Z
  * text       "tok" repeated 3*(i+1) times, space-joined

Deterministic output — rerunning reproduces the committed bytes.
"""

from __future__ import annotations

import os

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "xml")

_NS = "http://www.mediawiki.org/xml/export-0.11/"


def page(f: int, i: int) -> str:
    text = " ".join(["tok"] * (3 * (i + 1)))
    return (
        "  <page>\n"
        f"    <title>Page {f}-{i}</title>\n"
        "    <ns>0</ns>\n"
        f"    <id>{100 * f + i}</id>\n"
        f'    <revision id="{1000 * f + i}">\n'
        f"      <timestamp>2024-03-0{i + 1}T00:00:00Z</timestamp>\n"
        f"      <text>{text}</text>\n"
        "    </revision>\n"
        "  </page>\n"
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for f in range(3):
        path = os.path.join(OUT, f"wiki{f}.xml")
        with open(path, "w", newline="\n") as fh:
            fh.write(f'<mediawiki xmlns="{_NS}">\n')
            for i in range(4):
                fh.write(page(f, i))
            fh.write("</mediawiki>\n")
        print("wrote", path)
    # truncated dump: one complete page, then the tap turns off
    path = os.path.join(OUT, "broken.xml")
    with open(path, "w", newline="\n") as fh:
        fh.write(f'<mediawiki xmlns="{_NS}">\n')
        fh.write(page(9, 0))
        fh.write("  <page>\n    <title>Page 9-1</title>\n")  # torn
    print("wrote", path)


if __name__ == "__main__":
    main()
