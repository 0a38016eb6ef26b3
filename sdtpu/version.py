"""Version introspection (capability parity with reference sdod/version.py)."""

import subprocess

__version__ = "0.1.0"


def git_revision(short: bool = True) -> str:
    """Best-effort git revision of the installed tree; '' if unavailable.

    Mirrors the git-aware version introspection of the reference package
    (reference: sdod/version.py:6-39) without importing at package-init time.
    """
    try:
        args = ["git", "rev-parse", "--short" if short else "--verify", "HEAD"]
        out = subprocess.run(
            args, capture_output=True, text=True, timeout=5,
            cwd=__file__.rsplit("/", 2)[0],
        )
        return out.stdout.strip() if out.returncode == 0 else ""
    except Exception:
        return ""


def full_version() -> str:
    rev = git_revision()
    return f"{__version__}+git.{rev}" if rev else __version__
