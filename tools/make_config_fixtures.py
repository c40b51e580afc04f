"""Generate the committed config fixtures under data/configs/.

Closed-form in (p, s) for the q_config_ingest oracle:

  * proj{p}.toml, p ∈ {0,1}: top-level title "Project {p}"; [pkg]
    name "pkg{p}", version "1.{p}.0", deps = ["d0"... "d{p}"];
    [pkg.opts] workers = 2+p (int), fast = (p%2==0) (bool),
    ratio = p + 0.5 (float).
  * svc{s}.ini, s ∈ {0,1}: [server] host "h{s}.example",
    port "800{s}"; [db] url "db://svc{s}".
  * broken.ini: a missing-section-header torrent → one _corrupt row.

Deterministic output — rerunning reproduces the committed bytes.
"""

from __future__ import annotations

import os

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "configs")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for p in range(2):
        deps = ", ".join(f'"d{j}"' for j in range(p + 1))
        body = (
            f'title = "Project {p}"\n'
            "[pkg]\n"
            f'name = "pkg{p}"\n'
            f'version = "1.{p}.0"\n'
            f"deps = [{deps}]\n"
            "[pkg.opts]\n"
            f"workers = {2 + p}\n"
            f"fast = {'true' if p % 2 == 0 else 'false'}\n"
            f"ratio = {p}.5\n"
        )
        path = os.path.join(OUT, f"proj{p}.toml")
        with open(path, "w", newline="\n") as fh:
            fh.write(body)
        print("wrote", path)
    for s in range(2):
        body = (
            "[server]\n"
            f"host = h{s}.example\n"
            f"port = 800{s}\n"
            "[db]\n"
            f"url = db://svc{s}\n"
        )
        path = os.path.join(OUT, f"svc{s}.ini")
        with open(path, "w", newline="\n") as fh:
            fh.write(body)
        print("wrote", path)
    path = os.path.join(OUT, "broken.ini")
    with open(path, "w", newline="\n") as fh:
        fh.write("key_without_any_section = boom\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
