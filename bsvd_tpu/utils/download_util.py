"""Model/file download helpers
(reference: BasicSR/basicsr/utils/download_util.py:1-64).

This environment has no network egress; every function degrades to a clear
error when the network is unreachable, and everything is unit-testable
against a localhost HTTP server.
"""

import math
import os
from urllib.parse import urlparse

from bsvd_tpu.utils.misc import sizeof_fmt


def get_confirm_token(response):
    """Google Drive large-file confirmation token from cookies
    (reference download_util.py:38-42)."""
    for key, value in response.cookies.items():
        if key.startswith('download_warning'):
            return value
    return None


def save_response_content(response, destination, file_size=None,
                          chunk_size=32768):
    """Stream a requests response to disk with progress logging
    (reference download_util.py:46-64; tqdm replaced by plain prints)."""
    readable = sizeof_fmt(file_size) if file_size is not None else '?'
    total_chunks = (math.ceil(file_size / chunk_size)
                    if file_size is not None else None)
    downloaded = 0
    with open(destination, 'wb') as f:
        for i, chunk in enumerate(response.iter_content(chunk_size)):
            downloaded += len(chunk)
            if total_chunks and (i % 32 == 0 or i + 1 == total_chunks):
                print(f'Download {sizeof_fmt(downloaded)} / {readable}')
            if chunk:   # filter out keep-alive chunks
                f.write(chunk)


def download_file_from_google_drive(file_id, save_path):
    """Download a Google Drive file by id (reference
    download_util.py:8-35), handling the large-file confirm token."""
    import requests
    session = requests.Session()
    url = 'https://docs.google.com/uc?export=download'
    params = {'id': file_id}
    response = session.get(url, params=params, stream=True)
    token = get_confirm_token(response)
    if token:
        params['confirm'] = token
        response = session.get(url, params=params, stream=True)

    sized = session.get(url, params=params, stream=True,
                        headers={'Range': 'bytes=0-2'})
    file_size = None
    if 'Content-Range' in sized.headers:
        file_size = int(sized.headers['Content-Range'].split('/')[1])
    save_response_content(response, save_path, file_size)


def load_file_from_url(url, model_dir='experiments/pretrained_models',
                       progress=True, file_name=None):
    """Download ``url`` into ``model_dir`` unless already present; returns
    the local path (the torch.hub-style helper newer BasicSR exposes)."""
    del progress
    os.makedirs(model_dir, exist_ok=True)
    if file_name is None:
        file_name = os.path.basename(urlparse(url).path)
    cached = os.path.abspath(os.path.join(model_dir, file_name))
    if os.path.exists(cached):
        return cached
    import requests
    print(f'Downloading: "{url}" to {cached}')
    with requests.get(url, stream=True, timeout=30) as r:
        r.raise_for_status()
        size = r.headers.get('Content-Length')
        save_response_content(r, cached, int(size) if size else None)
    return cached
