"""All 22 mets-package golden cases from the reference test suite
(/root/reference/mets/mets_test.go), ported against the Python oracle."""

import pytest

from gocrd_ray.oracle import File, FLocat, Mets, MetsMatch


@pytest.fixture(scope="module")
def mets(mets_bytes):
    return Mets.from_bytes(mets_bytes)


# mets_test.go:8-30
@pytest.mark.parametrize(
    "grp,n",
    [
        ("NOT-A-VALID-FILEGRP", 0),
        ("OCR-D-IMG", 0),  # comment-only group
        ("OCR-D-GT-PAGE", 1),
        ("OCR-D-GT-ALTO", 2),
    ],
)
def test_find_file_groups(mets, grp, n):
    assert len(mets.find_file_grp(grp)) == n


# mets_test.go:32-59
@pytest.mark.parametrize(
    "m,n",
    [
        (MetsMatch(use="OCR-D-IMG"), 0),
        (MetsMatch(use="OCR-D-GT-PAGE"), 1),
        (MetsMatch(use="OCR-D-GT-ALTO"), 2),
        (MetsMatch(mime_type="application/alto+xml"), 2),
        (MetsMatch(mime_type="imge/tiff"), 0),
        (MetsMatch(mime_type="application/vnd.prima.page+xml"), 1),
        (MetsMatch(file_id="PAGE_0020_ALTO"), 1),
        (MetsMatch(file_id="PAGE_0020_PAGE"), 1),
        (MetsMatch(file_id="PAGE_0021_ALTO"), 1),
    ],
    ids=str,
)
def test_find(mets, m, n):
    assert len(mets.find(m)) == n


# mets_test.go:61-87
def test_files(mets):
    fs = mets.find_file_grp("OCR-D-GT-ALTO")
    assert fs[0] == File(
        mime_type="application/alto+xml",
        id="PAGE_0020_ALTO",
        flocat=FLocat(
            type="URL",
            url=(
                "https://github.com/OCR-D/assets/raw/master/data/"
                "kant_aufklaerung_1784/alto/kant_aufklaerung_1784_0020.xml"
            ),
        ),
    )
