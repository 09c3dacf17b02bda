#!/usr/bin/env python
"""Publish trained model folders to the Hugging Face Hub.

Counterpart of the reference's ``scripts/upload_esp_aves2_models_to_hf.py``:
for each model directory (local or cloud via the io layer), convert the
checkpoint to safetensors, write a ``.safetensors.sha256`` sidecar, create or
update the ``<org>/<model_name>`` repo, upload the artifacts, and add the
repo to a collection. Requires a HF token with write access
(``HF_TOKEN`` env or ``huggingface-cli login``).

Usage:
    python scripts/upload_models_to_hf.py --org EarthSpeciesProject \
        --collection esp-aves2 runs/esp-aves2-sl-beats-all [more dirs...]
    python scripts/upload_models_to_hf.py --dry-run runs/my_model
"""

import argparse
import hashlib
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def prepare_artifacts(model_dir: Path, work_dir: Path) -> list:
    """Convert checkpoints to safetensors + sha256 sidecars; collect uploads."""
    from scripts.convert_to_safetensors import convert_file  # noqa: E402

    uploads = []
    for path in sorted(model_dir.rglob("*")):
        if not path.is_file():
            continue
        rel = path.relative_to(model_dir)
        if path.suffix in (".pt", ".ckpt", ".bin"):
            out = work_dir / rel.with_suffix(".safetensors")
            out.parent.mkdir(parents=True, exist_ok=True)
            convert_file(str(path), str(out))
            digest = hashlib.sha256(out.read_bytes()).hexdigest()
            sha_path = out.with_suffix(out.suffix + ".sha256")
            sha_path.write_text(f"{digest}  {out.name}\n")
            uploads += [(out, str(rel.with_suffix(".safetensors"))),
                        (sha_path, str(rel.with_suffix(".safetensors")) + ".sha256")]
        elif path.suffix == ".safetensors":
            digest = hashlib.sha256(path.read_bytes()).hexdigest()
            sha_path = work_dir / (path.name + ".sha256")
            sha_path.write_text(f"{digest}  {path.name}\n")
            uploads += [(path, str(rel)), (sha_path, str(rel) + ".sha256")]
        elif path.suffix in (".json", ".md", ".yml", ".yaml", ".csv"):
            uploads.append((path, str(rel)))
    return uploads


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_dirs", nargs="+", type=Path)
    parser.add_argument("--org", default="EarthSpeciesProject")
    parser.add_argument("--collection", default=None)
    parser.add_argument("--private", action="store_true")
    parser.add_argument("--dry-run", action="store_true",
                        help="prepare artifacts + print the plan, no network")
    args = parser.parse_args()

    for model_dir in args.model_dirs:
        name = model_dir.name.replace("_", "-")
        repo_id = f"{args.org}/{name}"
        work_dir = Path(tempfile.mkdtemp(prefix=f"hfup_{name}_"))
        uploads = prepare_artifacts(model_dir, work_dir)
        print(f"{repo_id}: {len(uploads)} files")
        for src, dest in uploads:
            print(f"  {src} -> {dest}")
        if args.dry_run:
            continue

        from huggingface_hub import HfApi  # noqa: E402

        api = HfApi()
        api.create_repo(repo_id, exist_ok=True, private=args.private)
        for src, dest in uploads:
            api.upload_file(path_or_fileobj=str(src), path_in_repo=dest, repo_id=repo_id)
        if args.collection:
            try:
                collection = next(
                    (c for c in api.list_collections(owner=args.org)
                     if c.title == args.collection),
                    None,
                ) or api.create_collection(args.collection, namespace=args.org)
                api.add_collection_item(collection.slug, repo_id, item_type="model")
            except Exception as err:  # collection is best-effort
                print(f"  collection update failed: {err}")
        print(f"  uploaded {repo_id}")


if __name__ == "__main__":
    main()
