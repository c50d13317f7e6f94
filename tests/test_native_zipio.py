"""Native zip core (goliath_tpu/native) vs Python zipfile parity."""

import os
import zipfile

import numpy as np
import pytest

from goliath_tpu.native import zipio


@pytest.fixture(scope="module")
def sample_zip(tmp_path_factory):
    d = tmp_path_factory.mktemp("zips")
    p = d / "sample.zip"
    rng = np.random.RandomState(0)
    members = {
        "cam001/000001.bin": rng.bytes(100_000),       # compressible-ish
        "cam001/000002.bin": b"\x00" * 250_000,        # highly compressible
        "meta/info.json": b'{"a": 1}',
        "stored.bin": rng.bytes(4096),
    }
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members.items():
            if name == "stored.bin":
                zf.writestr(zipfile.ZipInfo(name), data,
                            compress_type=zipfile.ZIP_STORED)
            else:
                zf.writestr(name, data)
    return p, members


def test_native_available():
    assert zipio.have_native(), "g++/zlib build failed"


def test_namelist_and_sizes(sample_zip):
    p, members = sample_zip
    z = zipio.NativeZip(p)
    assert sorted(z.namelist()) == sorted(members)
    for name, data in members.items():
        assert z.size(name) == len(data)
    assert z.exists("meta/info.json")
    assert not z.exists("nope.bin")


def test_read_parity(sample_zip):
    p, members = sample_zip
    z = zipio.NativeZip(p)
    with zipfile.ZipFile(p) as zf:
        for name in members:
            assert z.read(name) == zf.read(name)


def test_missing_member_raises(sample_zip):
    p, _ = sample_zip
    z = zipio.NativeZip(p)
    with pytest.raises(KeyError):
        z.read("missing/file.bin")


def test_read_many(sample_zip):
    p, members = sample_zip
    pairs = [(str(p), name) for name in members] * 3
    out = zipio.read_many(pairs, nthreads=4)
    for (zp, name), data in zip(pairs, out):
        assert data == members[name]


def test_zip64_many_entries(tmp_path):
    # force ZIP64 via allowZip64 + >64k entries is slow; instead force with
    # a single large-offset-free archive using force_zip64 per member
    p = tmp_path / "z64.zip"
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as zf:
        with zf.open("big.bin", "w", force_zip64=True) as fh:
            fh.write(b"abc123" * 1000)
    z = zipio.NativeZip(p)
    with zipfile.ZipFile(p) as zf:
        assert z.read("big.bin") == zf.read("big.bin")
