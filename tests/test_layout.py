import pytest

from dla_tpu.tiles import TileLayout


class TestTileLayout:
    def test_basic_geometry(self):
        t = TileLayout(mb=256, nb=256, lm=1024, ln=1024)
        assert (t.mt, t.nt) == (4, 4)
        assert t.bsiz == 256 * 256
        assert t.tile_shape(0, 0) == (256, 256)
        assert t.tile_origin(2, 3) == (512, 768)

    def test_edge_tiles(self):
        t = TileLayout(mb=100, nb=100, lm=250, ln=250)
        assert (t.mt, t.nt) == (3, 3)
        assert t.tile_shape(2, 2) == (50, 50)
        assert t.tile_shape(0, 2) == (100, 50)
        with pytest.raises(IndexError):
            t.tile_shape(3, 0)

    def test_submatrix_view(self):
        t = TileLayout(mb=64, nb=64, lm=512, ln=512, ioff=128, joff=64, m=256, n=256)
        assert (t.mt, t.nt) == (4, 4)
        assert t.tile_origin(0, 0) == (128, 64)

    def test_validation(self):
        with pytest.raises(ValueError):
            TileLayout(mb=0, nb=64, lm=128, ln=128)
        with pytest.raises(ValueError):
            TileLayout(mb=64, nb=64, lm=128, ln=128, ioff=65)  # not tile-aligned
        with pytest.raises(ValueError):
            TileLayout(mb=64, nb=64, lm=128, ln=128, ioff=64, m=128)  # out of range

    def test_block_cyclic_ownership(self):
        t = TileLayout(mb=32, nb=32, lm=32 * 7, ln=32 * 7, p=2, q=3)
        # every tile owned exactly once; owner/local/global roundtrip
        seen = set()
        for pr in range(2):
            for qc in range(3):
                for (i, j) in t.local_tiles(pr, qc):
                    assert t.owner(i, j) == (pr, qc)
                    li, lj = t.local_index(i, j)
                    assert t.global_index(pr, qc, li, lj) == (i, j)
                    seen.add((i, j))
        assert len(seen) == t.mt * t.nt

    def test_local_grid_shape(self):
        t = TileLayout(mb=32, nb=32, lm=32 * 7, ln=32 * 7, p=2, q=3)
        for pr in range(2):
            for qc in range(3):
                shape = t.local_grid_shape(pr, qc)
                assert shape[0] * shape[1] >= len(t.local_tiles(pr, qc))
                assert len(t.local_tiles(pr, qc)) == shape[0] * shape[1]

    def test_load_balance(self):
        """Block-cyclic balances the shrinking trailing matrix — the reason
        p,q exist in the reference's descriptor API (SURVEY §2d)."""
        t = TileLayout(mb=64, nb=64, lm=64 * 16, ln=64 * 16, p=2, q=2)
        counts = {}
        for pr in range(2):
            for qc in range(2):
                lower = [(i, j) for (i, j) in t.local_tiles(pr, qc) if i >= j]
                counts[(pr, qc)] = len(lower)
        vals = list(counts.values())
        assert max(vals) - min(vals) <= t.mt  # near-even split of the triangle
