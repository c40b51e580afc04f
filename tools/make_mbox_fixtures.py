"""Generate the committed mbox fixtures under data/mbox/.

Three mailboxes, five messages each, every field closed-form in
(f, i) so the q_mbox_ingest oracle can recompute them in SQL:

  * mailbox  list{f}.mbox
  * Subject  "msg {i} of file {f}"
  * From     user{i}@example.com            To  list{f}@example.org
  * Date     2024-02-01 10:0{i}:00 +0000
  * body     (i+1) lines of "line {j} in message {i}\\n" (20 chars
             each with single-digit i, j → n_chars = (i+1)*20)
  * odd i    multipart/mixed with ONE base64 attachment (exercises
             the multipart walk + transfer decoding); even i plain

Deterministic output — rerunning reproduces the committed bytes.
"""

from __future__ import annotations

import base64
import os

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "mbox")


def message(f: int, i: int) -> str:
    body = "".join(f"line {j} in message {i}\n" for j in range(i + 1))
    head = (
        f"From user{i}@example.com Thu Feb  1 10:0{i}:00 2024\n"
        f"Message-ID: <m{f}.{i}@example>\n"
        f"Date: Thu, 01 Feb 2024 10:0{i}:00 +0000\n"
        f"From: User {i} <user{i}@example.com>\n"
        f"To: list{f}@example.org\n"
        f"Subject: msg {i} of file {f}\n"
        "MIME-Version: 1.0\n"
    )
    if i % 2 == 0:
        return (
            head
            + 'Content-Type: text/plain; charset="utf-8"\n'
            + "\n" + body + "\n"
        )
    boundary = f"b{f}{i}fixture"
    att = base64.b64encode(f"data{i}".encode()).decode()
    return (
        head
        + f'Content-Type: multipart/mixed; boundary="{boundary}"\n\n'
        + f"--{boundary}\n"
        + 'Content-Type: text/plain; charset="utf-8"\n\n'
        + body
        + f"\n--{boundary}\n"
        + "Content-Type: application/octet-stream\n"
        + "Content-Transfer-Encoding: base64\n"
        + f'Content-Disposition: attachment; filename="a{i}.bin"\n\n'
        + att + "\n"
        + f"--{boundary}--\n\n"
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for f in range(3):
        path = os.path.join(OUT, f"list{f}.mbox")
        with open(path, "w", newline="\n") as fh:
            for i in range(5):
                fh.write(message(f, i))
        print("wrote", path)


if __name__ == "__main__":
    main()
