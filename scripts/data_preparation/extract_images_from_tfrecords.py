#!/usr/bin/env python
"""Extract FFHQ / CelebA images from TFRecords into PNG folders or lmdb
(reference: BasicSR/scripts/data_preparation/extract_images_from_tfrecords.py).

Unlike the reference (which needs TensorFlow 1.15), this reads the TFRecord
container and the ``tf.train.Example`` protos with a self-contained parser —
the record framing is length-prefixed (uint64 len, crc, payload, crc) and the
Example message only needs a generic varint/length-delimited proto walker.

    python scripts/data_preparation/extract_images_from_tfrecords.py \
        --dataset ffhq --tf_file datasets/ffhq/ffhq-r10.tfrecords \
        --log_resolution 10 --save_root datasets/ffhq/
"""

import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 3)[0])  # repo root when run as a script

import argparse
import glob
import os
import struct

import cv2
import numpy as np


# ---------------------------------------------------------------------------
# TFRecord container + minimal protobuf wire-format reader
# ---------------------------------------------------------------------------

def iter_tfrecord(path):
    """Yield the raw payload bytes of each record in a TFRecord file.

    Framing per record: uint64le length, uint32 masked-crc32c(length),
    ``length`` payload bytes, uint32 masked-crc32c(payload). CRCs are not
    verified (we have no crc32c dependency; corrupt files fail at decode).
    """
    with open(path, 'rb') as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack('<Q', header[:8])
            payload = f.read(length)
            if len(payload) < length:
                raise EOFError(f'truncated record in {path}')
            f.read(4)   # payload crc
            yield payload


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf):
    """Yield (field_number, wire_type, value) over a serialized message.
    value: int for varint/fixed, memoryview for length-delimited."""
    pos = 0
    end = len(buf)
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:                                   # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:                                 # 64-bit
            val = struct.unpack_from('<Q', buf, pos)[0]
            pos += 8
        elif wire == 2:                                 # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = memoryview(buf)[pos:pos + ln]
            pos += ln
        elif wire == 5:                                 # 32-bit
            val = struct.unpack_from('<I', buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f'unsupported wire type {wire}')
        yield field, wire, val


def parse_example(buf):
    """Parse a tf.train.Example into {name: list-of-values}.

    Schema walked: Example.features(1) -> Features.feature(1) map entries
    (key(1)=name, value(2)=Feature) -> Feature bytes_list(1) /
    float_list(2) / int64_list(3), each with repeated value(1).
    """
    feats = {}
    for f, _, v in _iter_fields(buf):
        if f != 1:
            continue
        for f2, _, entry in _iter_fields(v):            # map entries
            if f2 != 1:
                continue
            name, values = None, []
            for f3, _, v3 in _iter_fields(entry):
                if f3 == 1:
                    name = bytes(v3).decode()
                elif f3 == 2:                            # Feature
                    for kind, _, lst in _iter_fields(v3):
                        for f5, w5, item in _iter_fields(lst):
                            if f5 != 1:
                                continue
                            if kind == 1:                # bytes_list
                                values.append(bytes(item))
                            elif kind == 2:              # float_list
                                if w5 == 2:              # packed
                                    values.extend(np.frombuffer(
                                        item, '<f4').tolist())
                                else:
                                    values.append(struct.unpack(
                                        '<f', struct.pack('<I', item))[0])
                            elif kind == 3:              # int64_list
                                if w5 == 2:              # packed varints
                                    pos, n = 0, len(item)
                                    while pos < n:
                                        iv, pos = _read_varint(item, pos)
                                        values.append(iv)
                                else:
                                    values.append(item)
            if name is not None:
                feats[name] = values
    return feats


# ---------------------------------------------------------------------------
# converters (reference behavior: BGR PNGs / lmdb with r{log_res} keys)
# ---------------------------------------------------------------------------

def _make_sink(save_root, basename, save_type):
    if save_type == 'lmdb':
        from bsvd_tpu.utils.lmdb_util import LmdbMaker
        save_path = os.path.join(save_root, f'{basename}.lmdb')
        os.makedirs(save_path, exist_ok=True)
        return save_path, LmdbMaker(save_path)
    if save_type == 'img':
        save_path = os.path.join(save_root, basename)
        os.makedirs(save_path, exist_ok=True)
        return save_path, None
    raise ValueError('Wrong save type.')


def _emit(img, idx, save_path, lmdb_maker, log_resolution, compress_level):
    if lmdb_maker is None:
        cv2.imwrite(os.path.join(save_path, f'{idx:08d}.png'), img)
    else:
        _, img_byte = cv2.imencode(
            '.png', img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        key = f'{idx:08d}/r{log_resolution:02d}'
        h, w, c = img.shape
        lmdb_maker.put(img_byte, key, (h, w, c))


def convert_ffhq_tfrecords(tf_file, log_resolution, save_root,
                           save_type='img', compress_level=1):
    """FFHQ records carry CHW RGB under 'data' with 'shape' = (c, h, w)."""
    save_path, maker = _make_sink(save_root, f'ffhq_{2**log_resolution}',
                                  save_type)
    idx = 0
    for record in sorted(glob.glob(tf_file)):
        print('Processing record: ', record)
        for payload in iter_tfrecord(record):
            feats = parse_example(payload)
            c, h, w = feats['shape']
            img = np.frombuffer(feats['data'][0], np.uint8).reshape((c, h, w))
            img = img.transpose(1, 2, 0)[:, :, ::-1]    # CHW RGB -> HWC BGR
            _emit(img, idx, save_path, maker, log_resolution, compress_level)
            idx += 1
    if maker is not None:
        maker.close()
    return idx


def convert_celeba_tfrecords(tf_file, log_resolution, save_root,
                             save_type='img', compress_level=1):
    """CelebA records carry HWC RGB under 'data' with 'shape' = (h, w, c);
    the output lmdb name carries the train/validation phase of the input."""
    phase = 'validation' if 'validation' in tf_file else 'train'
    save_path, maker = _make_sink(
        save_root, f'celeba_{2**log_resolution}_{phase}', save_type)
    idx = 0
    for record in sorted(glob.glob(tf_file)):
        print('Processing record: ', record)
        for payload in iter_tfrecord(record):
            feats = parse_example(payload)
            h, w, c = feats['shape']
            img = np.frombuffer(feats['data'][0], np.uint8).reshape((h, w, c))
            img = img[:, :, ::-1]                        # RGB -> BGR
            _emit(img, idx, save_path, maker, log_resolution, compress_level)
            idx += 1
    if maker is not None:
        maker.close()
    return idx


def make_ffhq_lmdb_from_imgs(folder_path, log_resolution, save_root,
                             save_type='lmdb', compress_level=1):
    """Pack a folder of (already-cropped) FFHQ images into lmdb."""
    if save_type != 'lmdb':
        raise ValueError('Wrong save type.')
    from bsvd_tpu.utils.lmdb_util import LmdbMaker
    save_path = os.path.join(save_root,
                             f'ffhq_{2**log_resolution}_crop1.2.lmdb')
    os.makedirs(save_path, exist_ok=True)
    maker = LmdbMaker(save_path)
    for idx, img_path in enumerate(sorted(glob.glob(
            os.path.join(folder_path, '*')))):
        print(f'Processing {idx}: ', img_path)
        img = cv2.imread(img_path)
        h, w, c = img.shape
        _, img_byte = cv2.imencode(
            '.png', img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        maker.put(img_byte, f'{idx:08d}/r{log_resolution:02d}', (h, w, c))
    maker.close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--dataset', type=str, default='ffhq',
                        help="'ffhq' | 'celeba'")
    parser.add_argument('--tf_file', type=str,
                        default='datasets/ffhq/ffhq-r10.tfrecords',
                        help='TFRecord file (glob pattern for celeba; quote '
                             'it so the shell does not expand the wildcard).')
    parser.add_argument('--log_resolution', type=int, default=10)
    parser.add_argument('--save_root', type=str, default='datasets/ffhq/')
    parser.add_argument('--save_type', type=str, default='img',
                        help="'img' | 'lmdb'")
    parser.add_argument('--compress_level', type=int, default=1)
    args = parser.parse_args(argv)

    convert = (convert_ffhq_tfrecords if args.dataset == 'ffhq'
               else convert_celeba_tfrecords)
    convert(args.tf_file, args.log_resolution, args.save_root,
            save_type=args.save_type, compress_level=args.compress_level)


if __name__ == '__main__':
    main()
