"""Download + verify the paper's 6 spatiotemporal datasets.

The reference's experiments read ``{dataset}.{series}.{train,test}.csv``
files from a data root (reference ``scripts/README:12-41``); the datasets
are published at Zenodo, DOI ``10.5281/zenodo.12735404`` (the same archive
also carries every method's predictions). This script fetches that archive
where network access exists, unpacks it, and verifies the layout against
the dataset registry so the CLI (`bayesnf_tpu.cli.evaluate`), the
tutorials, and the PARITY comparisons can run on the real data:

    python -m bayesnf_tpu.cli.prepare_data --dest datasets/
    python -m bayesnf_tpu.cli.evaluate --dataset=chickenpox \
        --data_root datasets/ --output_dir out/ --start_id 5 --stop_id 6

Offline environments: download ``datasets.zip`` elsewhere, then run with
``--archive /path/to/datasets.zip`` to unpack + verify without network.
`--verify-only` checks an existing data root and exits non-zero listing
anything missing.
"""

import argparse
import os
import sys
import zipfile

from bayesnf_tpu.cli import registry

ZENODO_RECORD = '12735404'
ZENODO_URL = (
    f'https://zenodo.org/api/records/{ZENODO_RECORD}/files/datasets.zip/content'
)
DOI = '10.5281/zenodo.12735404'


def expected_files(dataset: str) -> list[str]:
  """The train/test CSV names the registry says this dataset comprises."""
  cfg = registry.dataset_config(dataset)
  names = []
  for series in range(cfg['num_series']):
    sid = cfg['series_id_fmt'](series)
    names.append(f'{dataset}.{sid}.train.csv')
    names.append(f'{dataset}.{sid}.test.csv')
  return names


def verify_layout(data_root: str, datasets=None) -> dict[str, list[str]]:
  """{dataset: [missing files]} for the requested (default: all) datasets."""
  missing = {}
  for dataset in datasets or registry.runnable_datasets():
    absent = [
        name for name in expected_files(dataset)
        if not os.path.exists(os.path.join(data_root, name))
    ]
    if absent:
      missing[dataset] = absent
  return missing


def download(dest_zip: str) -> None:
  """Fetch datasets.zip from Zenodo (needs network access)."""
  import urllib.request

  print(f'downloading {ZENODO_URL} (DOI {DOI}) -> {dest_zip}')
  try:
    urllib.request.urlretrieve(ZENODO_URL, dest_zip)  # noqa: S310
  except Exception as err:
    raise SystemExit(
        f'download failed ({err}). If this machine has no network access, '
        f'fetch datasets.zip from DOI {DOI} elsewhere and re-run with '
        f'--archive /path/to/datasets.zip.'
    ) from err


def unpack(archive: str, dest: str) -> None:
  """Unzip, flattening any single top-level directory onto `dest`."""
  os.makedirs(dest, exist_ok=True)
  with zipfile.ZipFile(archive) as zf:
    names = [n for n in zf.namelist() if not n.endswith('/')]
    roots = {n.split('/', 1)[0] for n in names if '/' in n}
    strip = len(names) > 0 and all('/' in n for n in names) and len(roots) == 1
    dest_root = os.path.realpath(dest)
    for name in names:
      rel = name.split('/', 1)[1] if strip else name
      # Zip-slip guard: reject absolute entries and any '..' path
      # component (a mid-path '..' escapes dest just as a leading one
      # does), then double-check the resolved path stays under dest.
      parts = rel.replace('\\', '/').split('/')
      if not rel or rel.startswith('/') or '..' in parts:
        continue
      out = os.path.join(dest, rel)
      if os.path.commonpath(
          [dest_root, os.path.realpath(out)]
      ) != dest_root:
        continue
      os.makedirs(os.path.dirname(out) or dest, exist_ok=True)
      with zf.open(name) as src, open(out, 'wb') as dst:
        dst.write(src.read())


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--dest', default='datasets',
                      help='directory to place the CSVs in')
  parser.add_argument('--archive', default=None,
                      help='pre-downloaded datasets.zip (skips the download)')
  parser.add_argument('--verify-only', action='store_true',
                      help='only check an existing --dest layout')
  parser.add_argument('--datasets', nargs='*', default=None,
                      help='subset to verify (default: all six)')
  args = parser.parse_args(argv)

  if not args.verify_only:
    archive = args.archive
    if archive is None:
      archive = os.path.join(args.dest, 'datasets.zip')
      os.makedirs(args.dest, exist_ok=True)
      download(archive)
    unpack(archive, args.dest)

  missing = verify_layout(args.dest, args.datasets)
  if missing:
    for dataset, absent in missing.items():
      print(f'{dataset}: MISSING {len(absent)} files '
            f'(first: {absent[0]})')
    return 1
  checked = args.datasets or registry.runnable_datasets()
  print(f'ok: {", ".join(checked)} complete under {args.dest}')
  return 0


if __name__ == '__main__':
  sys.exit(main())
