/* Minimal from-scratch NIFTI-1 reader/writer backing nifti1_io.h
 * (TEST HARNESS ONLY - see the header for why this exists).
 *
 * Supports: .nii and .nii.gz, native-endian headers, the integer and
 * float datatypes imutil/nifti.c dispatches on, scl_slope/scl_inter
 * passthrough, vox_offset.  gzopen reads plain files transparently, so
 * one read path covers both.  Mirrors the header layout knowledge in
 * sift3d_tpu/io/nifti.py (the NIFTI-1 standard, 348-byte header).
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <zlib.h>

#include "nifti1_io.h"

/* NIFTI-1 header field offsets (bytes) in the 348-byte header. */
#define HDR_SIZE 348
#define OFF_SIZEOF_HDR 0
#define OFF_DIM 40          /* short dim[8] */
#define OFF_DATATYPE 70     /* short */
#define OFF_BITPIX 72       /* short */
#define OFF_PIXDIM 76       /* float pixdim[8] */
#define OFF_VOX_OFFSET 108  /* float */
#define OFF_SCL_SLOPE 112   /* float */
#define OFF_SCL_INTER 116   /* float */
#define OFF_XYZT_UNITS 123  /* char */
#define OFF_MAGIC 344       /* char magic[4] */

static int dt_size(int code)
{
    switch (code) {
    case DT_UINT8: case DT_INT8: return 1;
    case DT_UINT16: case DT_INT16: return 2;
    case DT_UINT32: case DT_INT32: case DT_FLOAT32: return 4;
    case DT_UINT64: case DT_INT64: case DT_FLOAT64:
    case DT_COMPLEX64: return 8;
    default: return 0;
    }
}

const char *nifti_datatype_string(int code)
{
    switch (code) {
    case DT_UINT8: return "UINT8";
    case DT_INT8: return "INT8";
    case DT_UINT16: return "UINT16";
    case DT_INT16: return "INT16";
    case DT_UINT32: return "UINT32";
    case DT_INT32: return "INT32";
    case DT_UINT64: return "UINT64";
    case DT_INT64: return "INT64";
    case DT_FLOAT32: return "FLOAT32";
    case DT_FLOAT64: return "FLOAT64";
    case DT_COMPLEX64: return "COMPLEX64";
    default: return "UNKNOWN";
    }
}

nifti_image *nifti_image_read(const char *path, int read_data)
{
    unsigned char hdr[HDR_SIZE];
    gzFile f;
    nifti_image *nim;
    int32_t sizeof_hdr;
    int16_t dim16[8], datatype;
    float pixdim[8], vox_offset, slope, inter;
    int i;
    size_t nvox, nbytes;

    if ((f = gzopen(path, "rb")) == NULL)
        return NULL;
    if (gzread(f, hdr, HDR_SIZE) != HDR_SIZE) {
        gzclose(f);
        return NULL;
    }
    memcpy(&sizeof_hdr, hdr + OFF_SIZEOF_HDR, 4);
    if (sizeof_hdr != HDR_SIZE) {   /* byte-swapped files unsupported */
        fprintf(stderr, "mini_nifti: %s: unsupported header (swapped "
                "endianness or not NIFTI-1)\n", path);
        gzclose(f);
        return NULL;
    }
    if (memcmp(hdr + OFF_MAGIC, "n+1", 3) != 0) {
        fprintf(stderr, "mini_nifti: %s: only single-file n+1 NIFTI "
                "supported\n", path);
        gzclose(f);
        return NULL;
    }
    memcpy(dim16, hdr + OFF_DIM, 16);
    memcpy(&datatype, hdr + OFF_DATATYPE, 2);
    memcpy(pixdim, hdr + OFF_PIXDIM, 32);
    memcpy(&vox_offset, hdr + OFF_VOX_OFFSET, 4);
    memcpy(&slope, hdr + OFF_SCL_SLOPE, 4);
    memcpy(&inter, hdr + OFF_SCL_INTER, 4);

    if (dt_size(datatype) == 0) {
        fprintf(stderr, "mini_nifti: %s: unsupported datatype %d\n",
                path, (int) datatype);
        gzclose(f);
        return NULL;
    }

    if ((nim = calloc(1, sizeof(*nim))) == NULL) {
        gzclose(f);
        return NULL;
    }
    nim->ndim = dim16[0];
    if (nim->ndim < 1 || nim->ndim > 7) {
        free(nim);
        gzclose(f);
        return NULL;
    }
    nim->dim[0] = nim->ndim;
    for (i = 1; i < 8; i++) {
        nim->dim[i] = (i <= nim->ndim && dim16[i] > 0) ? dim16[i] : 1;
        nim->pixdim[i] = pixdim[i];
    }
    nim->nx = nim->dim[1];
    nim->ny = nim->dim[2];
    nim->nz = nim->dim[3];
    nim->nt = nim->dim[4];
    nim->nu = nim->dim[5];
    nim->nv = nim->dim[6];
    nim->nw = nim->dim[7];
    nim->dx = pixdim[1];
    nim->dy = pixdim[2];
    nim->dz = pixdim[3];
    nim->dt = pixdim[4];
    nim->datatype = datatype;
    nim->nbyper = dt_size(datatype);
    nim->scl_slope = slope;
    nim->scl_inter = inter;
    nim->byteorder = 1;
    nim->fname = strdup(path);
    nim->iname = strdup(path);

    nvox = 1;
    for (i = 1; i <= nim->ndim; i++)
        nvox *= (size_t) nim->dim[i];
    nim->nvox = nvox;

    if (read_data) {
        nbytes = nvox * (size_t) nim->nbyper;
        if ((nim->data = malloc(nbytes)) == NULL) {
            nifti_image_free(nim);
            gzclose(f);
            return NULL;
        }
        if (gzseek(f, (z_off_t) vox_offset, SEEK_SET) < 0 ||
            (size_t) gzread(f, nim->data, (unsigned) nbytes) != nbytes) {
            fprintf(stderr, "mini_nifti: %s: truncated data\n", path);
            nifti_image_free(nim);
            gzclose(f);
            return NULL;
        }
    }
    gzclose(f);
    return nim;
}

nifti_image *nifti_make_new_nim(const int dims[], int datatype,
                                int data_fill)
{
    nifti_image *nim;
    int i;
    size_t nvox = 1;

    if (dt_size(datatype) == 0)
        return NULL;
    if ((nim = calloc(1, sizeof(*nim))) == NULL)
        return NULL;
    nim->ndim = dims[0];
    if (nim->ndim < 1 || nim->ndim > 7) {
        free(nim);
        return NULL;
    }
    nim->dim[0] = nim->ndim;
    for (i = 1; i < 8; i++) {
        nim->dim[i] = (i <= nim->ndim && dims[i] > 0) ? dims[i] : 1;
        nim->pixdim[i] = 1.0f;
        nvox *= (size_t) nim->dim[i];
    }
    nim->nx = nim->dim[1];
    nim->ny = nim->dim[2];
    nim->nz = nim->dim[3];
    nim->nt = nim->dim[4];
    nim->nu = nim->dim[5];
    nim->nv = nim->dim[6];
    nim->nw = nim->dim[7];
    nim->dx = nim->dy = nim->dz = nim->dt = 1.0f;
    nim->datatype = datatype;
    nim->nbyper = dt_size(datatype);
    nim->nvox = nvox;
    nim->scl_slope = 1.0f;
    nim->scl_inter = 0.0f;
    nim->byteorder = 1;
    if (data_fill &&
        (nim->data = calloc(nvox, (size_t) nim->nbyper)) == NULL) {
        free(nim);
        return NULL;
    }
    return nim;
}

int nifti_set_filenames(nifti_image *nim, const char *prefix,
                        int check, int set_byte_order)
{
    size_t n;

    (void) check;
    if (nim == NULL || prefix == NULL)
        return -1;
    n = strlen(prefix);
    /* Only single-file .nii / .nii.gz outputs are supported. */
    if (!((n > 4 && strcmp(prefix + n - 4, ".nii") == 0) ||
          (n > 7 && strcmp(prefix + n - 7, ".nii.gz") == 0))) {
        fprintf(stderr, "mini_nifti: unsupported output extension: %s\n",
                prefix);
        return -1;
    }
    free(nim->fname);
    free(nim->iname);
    nim->fname = strdup(prefix);
    nim->iname = strdup(prefix);
    if (set_byte_order)
        nim->byteorder = 1;
    return (nim->fname && nim->iname) ? 0 : -1;
}

int nifti_nim_is_valid(nifti_image *nim, int complain)
{
    if (nim == NULL || nim->data == NULL || nim->fname == NULL ||
        nim->ndim < 1 || nim->ndim > 7 || dt_size(nim->datatype) == 0) {
        if (complain)
            fprintf(stderr, "mini_nifti: invalid nifti_image\n");
        return 0;
    }
    return 1;
}

void nifti_image_write(nifti_image *nim)
{
    unsigned char hdr[HDR_SIZE + 4];    /* header + 4-byte extender */
    int16_t dim16[8], dtcode, bitpix;
    float pixdim[8], voxoff;
    int32_t sz = HDR_SIZE;
    int i;
    size_t n, nbytes;
    char xyzt = 2;                      /* NIFTI_UNITS_MM */

    if (!nifti_nim_is_valid(nim, 1))
        return;
    memset(hdr, 0, sizeof(hdr));
    memcpy(hdr + OFF_SIZEOF_HDR, &sz, 4);
    for (i = 0; i < 8; i++) {
        dim16[i] = (int16_t) nim->dim[i];
        pixdim[i] = nim->pixdim[i];
    }
    dim16[0] = (int16_t) nim->ndim;
    pixdim[1] = nim->dx;
    pixdim[2] = nim->dy;
    pixdim[3] = nim->dz;
    pixdim[4] = nim->dt;
    memcpy(hdr + OFF_DIM, dim16, 16);
    dtcode = (int16_t) nim->datatype;
    bitpix = (int16_t) (8 * nim->nbyper);
    memcpy(hdr + OFF_DATATYPE, &dtcode, 2);
    memcpy(hdr + OFF_BITPIX, &bitpix, 2);
    memcpy(hdr + OFF_PIXDIM, pixdim, 32);
    voxoff = (float) (HDR_SIZE + 4);
    memcpy(hdr + OFF_VOX_OFFSET, &voxoff, 4);
    memcpy(hdr + OFF_SCL_SLOPE, &nim->scl_slope, 4);
    memcpy(hdr + OFF_SCL_INTER, &nim->scl_inter, 4);
    memcpy(hdr + OFF_XYZT_UNITS, &xyzt, 1);
    memcpy(hdr + OFF_MAGIC, "n+1", 4);

    nbytes = nim->nvox * (size_t) nim->nbyper;
    n = strlen(nim->fname);
    if (n > 3 && strcmp(nim->fname + n - 3, ".gz") == 0) {
        gzFile f = gzopen(nim->fname, "wb");
        if (f == NULL)
            return;
        gzwrite(f, hdr, sizeof(hdr));
        gzwrite(f, nim->data, (unsigned) nbytes);
        gzclose(f);
    } else {
        FILE *f = fopen(nim->fname, "wb");
        if (f == NULL)
            return;
        fwrite(hdr, 1, sizeof(hdr), f);
        fwrite(nim->data, 1, nbytes, f);
        fclose(f);
    }
}

void nifti_image_free(nifti_image *nim)
{
    if (nim == NULL)
        return;
    free(nim->data);
    free(nim->fname);
    free(nim->iname);
    free(nim);
}

void nifti_free_extensions(nifti_image *nim)
{
    (void) nim;                         /* extensions not supported */
}
