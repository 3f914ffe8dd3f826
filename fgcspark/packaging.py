"""S7 — result packaging (reference api.R:228-264).

After a conversion the reference's API worker:
1. greps the ORIGINAL citable archive for `^readme.*\\.txt$` and
   extracts it next to the outputs (api.R:236-240), so the published
   bundle carries the download's citation page;
2. zips the work directory into `<input>_geo_<fmt>.zip`, EXCLUDING
   the input file, the original archive, per-chunk additional_file_*
   dirs, the progress file and scratch members (api.R:244-259,
   flags -rj9qX: recurse, junk paths, best compression).

Driver-side by design: packaging runs once per conversion over the
handful of sink files a job produces — it is not a distributed
operator and must not pretend to be one.
"""

from __future__ import annotations

import re
import zipfile
from pathlib import Path

README_RE = re.compile(r"^readme.*\.txt$")


def extract_readme(archive_path: str | Path, out_dir: str | Path) -> Path | None:
    """Copy the archive's readme member into out_dir (api.R:236-240).
    Returns the extracted path, or None when the archive has none."""
    archive_path = Path(archive_path)
    out_dir = Path(out_dir)
    if not archive_path.exists():
        return None
    with zipfile.ZipFile(archive_path) as zf:
        for name in zf.namelist():
            base = name.rsplit("/", 1)[-1]
            if README_RE.match(base):
                out_dir.mkdir(parents=True, exist_ok=True)
                target = out_dir / base
                target.write_bytes(zf.read(name))
                return target
    return None


def package_outputs(
    work_dir: str | Path,
    input_name: str,
    fmt: str,
    exclude: list[str] | None = None,
) -> Path:
    """Bundle work_dir into `<input_name>_geo_<fmt>.zip` inside
    work_dir (api.R:244-259). Paths are junked (-j): members are
    stored flat by base name. `exclude` lists base names to skip, on
    top of the defaults the reference always skips."""
    work_dir = Path(work_dir)
    zip_path = work_dir / f"{input_name}_geo_{fmt}.zip"
    skip = set(exclude or [])
    skip |= {zip_path.name, "occurrences.txt", "samples.txt", "facts", "media"}
    members = [
        p
        for p in sorted(work_dir.rglob("*"))
        if p.is_file()
        and p.name not in skip
        and not p.name.startswith("additional_file_")
        and not any(part.startswith("additional_file_") for part in p.parts)
        and not any(part in skip for part in p.relative_to(work_dir).parts)
    ]
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED, compresslevel=9) as zf:
        for p in members:
            zf.write(p, arcname=p.name)  # -j: junk paths
    return zip_path
