"""scripts/package.py — the --py-files zip must carry the whole package."""

import os
import zipfile

from scripts.package import PKG, REPO, build


def test_zip_contains_every_package_module(tmp_path):
    out = build(str(tmp_path / "engine.zip"))
    with zipfile.ZipFile(out) as zf:
        names = set(zf.namelist())
    on_disk = set()
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for name in files:
            if name.endswith(".py"):
                on_disk.add(os.path.relpath(os.path.join(root, name), REPO))
    assert on_disk, "package source not found"
    assert names == on_disk
    # worker-side imports of the Arrow UDFs must be in the zip
    for mod in (
        f"{PKG}/core/parse.py",
        f"{PKG}/functions/udfs.py",
        f"{PKG}/operators/extract.py",
    ):
        assert mod in names
