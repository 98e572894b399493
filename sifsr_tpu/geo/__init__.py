"""Host-side geospatial I/O and projection math (no GDAL dependency).

The reference leans on GDAL/rasterio + gdalwarp subprocesses for raster I/O
and reprojection (SURVEY.md §2 #2, #21). This package provides self-contained
equivalents:

- tiff:        GeoTIFF reader/writer (strips/tiles, none/deflate/packbits,
               GeoTIFF tags: pixel scale, tiepoint, geokeys)
- projection:  MODIS sinusoidal <-> WGS84 lat/lon <-> UTM (Transverse
               Mercator) forward/inverse transforms
- warp:        raster reprojection between CRSs with bilinear/cubic sampling
               (replaces the gdalwarp subprocess of the eval harness)
"""

from sifsr_tpu.geo.tiff import read_geotiff, write_geotiff, GeoTiff
