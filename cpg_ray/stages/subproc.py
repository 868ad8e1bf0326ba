"""Out-of-process extractor stage — the pattern for parsers that can't
run in-process (reference analog: the TypeScript frontend driving a
bundled NodeJS script over a pipe, TypeScriptLanguageFrontend.kt:1-282,
and the JNI Go frontend that forces process isolation,
GoLanguageFrontend.kt:40-105).

Shape: a ``map_batches`` actor class whose ``__init__`` spawns ONE
long-lived child process per actor; batches stream over stdin/stdout as
length-prefixed base64 lines (no shared memory assumptions — the child
could be node/jvm/native).  The child is restarted on death mid-batch
(best-effort posture; a poisoned row yields a problem marker, never an
exception)."""

from __future__ import annotations

import base64
import subprocess
import sys

import pyarrow as pa

# The child worker: reads base64(html) lines, writes base64(utf-8 text)
# lines.  Kept to stdlib-only so the subprocess needs no environment.
_CHILD_SRC = r"""
import base64, sys
sys.path.insert(0, {repo!r})
from cpg_ray.stages.extract import extract_text
for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    try:
        html = base64.b64decode(line)
        text, problem = extract_text(html)
        out = base64.b64encode(text.encode("utf-8")).decode()
        flag = "1" if problem else "0"
    except Exception:
        out, flag = "", "2"
    sys.stdout.write(flag + " " + out + "\n")
    sys.stdout.flush()
"""


class SubprocessExtractText:
    """pages batch → (url, text, is_problem) via a per-actor child
    process."""

    def __init__(self, repo_dir: str = "/root/repo"):
        self.repo_dir = repo_dir
        self._start()

    def _start(self) -> None:
        self.child = subprocess.Popen(
            [sys.executable, "-u", "-c", _CHILD_SRC.format(repo=self.repo_dir)],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
        )

    def _one(self, html: bytes) -> tuple[str, bool]:
        payload = base64.b64encode(html).decode() + "\n"
        try:
            self.child.stdin.write(payload)
            self.child.stdin.flush()
            line = self.child.stdout.readline()
            if not line:
                raise BrokenPipeError("child died")
            flag, _, b64 = line.strip().partition(" ")
            return base64.b64decode(b64).decode("utf-8"), flag != "0"
        except (BrokenPipeError, OSError):
            self._start()  # restart once, mark the row as a problem
            return "", True

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts, problems = [], []
        for html in batch["html"].to_pylist():
            t, p = self._one(html)
            texts.append(t)
            problems.append(p)
        return pa.table({"url": urls, "text": texts, "is_problem": problems})

    def __del__(self):  # best-effort child cleanup
        try:
            self.child.kill()
        except Exception:
            pass
