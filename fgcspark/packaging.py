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


def poll_status(
    conv_dir: str | Path,
    timeout: float = 30.0,
    sleep: float = 0.1,
) -> dict:
    """Reference /status/{id} response envelope (api.R:288-386),
    faithfully including the poll loop and its timeout clamp:

    - missing conversion dir        -> {"status_code": 404, "body": "File not found"}
    - `error.txt` present           -> 400 + parsed error taxonomy
    - `*_geo_*.zip` bundle present  -> 303 + Location: /output/{id},
                                       status complete, progress 100
    - neither within the (clamped)  -> 200 + status pending +
      timeout window                   progress_percent from `progress`

    The clamp mirrors api.R:313-315 exactly: effective timeout =
    min(max(timeout - 1, sleep), 60) — a server never long-polls more
    than 60 s regardless of what the client asks for.

    Driver-side by design, like the rest of this module: it watches a
    single conversion work dir."""
    import time as _time

    from fgcspark.errors import read_error_msg

    conv_dir = Path(conv_dir)
    cid = conv_dir.name
    if not conv_dir.is_dir():
        return {"status_code": 404, "body": "File not found"}

    eff = min(max(float(timeout) - 1.0, sleep), 60.0)
    timer = 0.0
    status: str | None = None
    # check order mirrors api.R:320-344 exactly: bundle found, then
    # timeout -> pending, then error.txt OVERRIDES both (an error
    # discovered in the same tick as the bundle still reports 400)
    while status is None:
        if any(re.search(r"_geo_.*\.zip$", p.name) for p in conv_dir.iterdir()):
            status = "complete"
        timer += sleep
        if status is None and timer > eff:
            status = "pending"
        if (conv_dir / "error.txt").exists():
            status = "error"
        if status is None:
            _time.sleep(sleep)

    if status == "error":
        msg = (conv_dir / "error.txt").read_text()
        return {"status_code": 400, "body": {"id": cid, **read_error_msg(msg)}}
    if status == "pending":
        prog_file = conv_dir / "progress"
        progress = int(prog_file.read_text().split()[0]) if prog_file.exists() else 0
        return {
            "status_code": 200,
            "body": {"id": cid, "status": "pending", "progress_percent": progress},
        }
    return {
        "status_code": 303,
        "location": f"/output/{cid}",
        "body": {"id": cid, "status": "complete", "progress_percent": 100},
    }


def output_response(conv_dir: str | Path) -> dict:
    """Reference /output/{id} twin (api.R:389-412): the bundle path as
    an attachment, 404 when the conversion dir is missing."""
    conv_dir = Path(conv_dir)
    if not conv_dir.is_dir():
        return {"status_code": 404, "body": "File not found"}
    zips = sorted(
        p for p in conv_dir.iterdir() if re.search(r"_geo_.*\.zip$", p.name)
    )
    if not zips:
        return {"status_code": 404, "body": "File not found"}
    return {
        "status_code": 200,
        "attachment": str(zips[0]),
        "content_type": "application/zip",
    }
