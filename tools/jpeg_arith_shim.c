/* Golden-vector shim for the arithmetic-coded JPEG codec
 * (letarette_spark/functions/jpeg_arith.py).
 *
 * Drives the system libjpeg (which implements ITU-T T.81 Annex D/F/G
 * arithmetic coding) to produce interop goldens, exactly like the
 * snowball stemmers are pinned against the compiled libstemmer:
 *
 *   encode W H QUALITY PROGRESSIVE GRAY SUBSAMP [RESTART]
 *       stdin:  raw 8-bit pixels (W*H gray, or W*H*3 RGB)
 *       stdout: arithmetic-coded JFIF bytes
 *   coef
 *       stdin:  any JPEG
 *       stdout: text dump of the entropy-decoded quantized coefficients
 *               (zigzag order, one block per line) — the exact values an
 *               independent entropy decoder must reproduce
 *   decode
 *       stdin:  any JPEG
 *       stdout: "W H NC\n" + raw interleaved 8-bit pixels
 *
 * Built on demand by tools/gen_jpeg_arith_goldens.py:
 *   gcc -O2 -o /tmp/jpeg_arith_shim tools/jpeg_arith_shim.c -ljpeg
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void fail_exit(j_common_ptr cinfo) {
  (*cinfo->err->output_message)(cinfo);
  exit(2);
}

static unsigned char *read_all(FILE *f, size_t *n) {
  size_t cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  for (;;) {
    size_t got = fread(buf + len, 1, cap - len, f);
    len += got;
    if (got == 0) break;
    if (len == cap) buf = realloc(buf, cap <<= 1);
  }
  *n = len;
  return buf;
}

static int do_encode(int argc, char **argv) {
  int w = atoi(argv[2]), h = atoi(argv[3]), quality = atoi(argv[4]);
  int progressive = atoi(argv[5]), gray = atoi(argv[6]);
  int subsamp = atoi(argv[7]); /* 0 = 4:4:4, 1 = default 4:2:0 */
  int restart = argc > 8 ? atoi(argv[8]) : 0;
  size_t n;
  unsigned char *pixels = read_all(stdin, &n);
  int ncomp = gray ? 1 : 3;
  if ((int)n < w * h * ncomp) return 3;

  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = fail_exit;
  jpeg_create_compress(&cinfo);

  unsigned char *out = NULL;
  unsigned long outlen = 0;
  jpeg_mem_dest(&cinfo, &out, &outlen);

  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = ncomp;
  cinfo.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  cinfo.arith_code = TRUE;
  jpeg_set_quality(&cinfo, quality, TRUE);
  if (!gray && !subsamp) {
    cinfo.comp_info[0].h_samp_factor = 1;
    cinfo.comp_info[0].v_samp_factor = 1;
  }
  if (restart) cinfo.restart_interval = restart;
  if (progressive) jpeg_simple_progression(&cinfo);

  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = pixels + (size_t)cinfo.next_scanline * w * ncomp;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fwrite(out, 1, outlen, stdout);
  return 0;
}

static int do_coef(void) {
  size_t n;
  unsigned char *data = read_all(stdin, &n);
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = fail_exit;
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&cinfo);
  printf("%d %d %d\n", cinfo.image_width, cinfo.image_height,
         cinfo.num_components);
  for (int ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = cinfo.comp_info + ci;
    printf("comp %d %d %d\n", comp->component_id,
           (int)comp->width_in_blocks, (int)comp->height_in_blocks);
    for (JDIMENSION by = 0; by < comp->height_in_blocks; by++) {
      JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
      for (JDIMENSION bx = 0; bx < comp->width_in_blocks; bx++) {
        for (int k = 0; k < DCTSIZE2; k++)
          printf(k ? " %d" : "%d", rows[0][bx][k]);
        printf("\n");
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

static int do_decode(void) {
  size_t n;
  unsigned char *data = read_all(stdin, &n);
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = fail_exit;
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  printf("%d %d %d\n", cinfo.output_width, cinfo.output_height,
         cinfo.output_components);
  size_t stride = (size_t)cinfo.output_width * cinfo.output_components;
  unsigned char *row = malloc(stride);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rp = row;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    fwrite(row, 1, stride, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 8 && !strcmp(argv[1], "encode")) return do_encode(argc, argv);
  if (argc >= 2 && !strcmp(argv[1], "coef")) return do_coef();
  if (argc >= 2 && !strcmp(argv[1], "decode")) return do_decode();
  fprintf(stderr, "usage: encode|coef|decode ...\n");
  return 1;
}
