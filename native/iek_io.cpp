// iek_io — native image IO runtime for image_enhance_keras_tpu.
//
// The reference delegates all decode/encode to Python-side PIL/scipy
// (models.py:212,415); this library provides the native data plane the
// TPU build uses to keep host-side IO off the Python interpreter:
//   * BMP 24/32-bit decode + 24-bit encode (own implementation)
//   * PNG decode/encode via libpng (8-bit RGB/RGBA/gray, palette expanded)
//   * PPM (P6) decode/encode
//   * a pthread pool batch loader: decode N files concurrently
//
// C ABI for ctypes; every returned buffer is malloc'd RGB8 (H*W*3) and must
// be released with iek_free.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <png.h>
#include <pthread.h>

extern "C" {

void iek_free(uint8_t *p) { free(p); }

// ---------------------------------------------------------------------------
// BMP
// ---------------------------------------------------------------------------

static uint32_t rd32(const uint8_t *p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static int32_t rds32(const uint8_t *p) { return (int32_t)rd32(p); }
static uint16_t rd16(const uint8_t *p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

static int bmp_decode(const uint8_t *buf, size_t len, uint8_t **out, int *h,
                      int *w) {
  if (len < 54 || buf[0] != 'B' || buf[1] != 'M') return -1;
  uint32_t pix_off = rd32(buf + 10);
  uint32_t hdr = rd32(buf + 14);
  if (hdr < 40) return -2;
  int32_t iw = rds32(buf + 18);
  int32_t ih = rds32(buf + 22);
  uint16_t bpp = rd16(buf + 28);
  uint32_t comp = rd32(buf + 30);
  if (comp != 0 || (bpp != 24 && bpp != 32) || iw <= 0 || ih == 0) return -3;
  int flip = ih > 0;
  if (ih < 0) ih = -ih;
  int nb = bpp / 8;
  size_t stride = ((size_t)iw * nb + 3) & ~(size_t)3;
  if (pix_off + stride * ih > len) return -4;
  uint8_t *img = (uint8_t *)malloc((size_t)iw * ih * 3);
  if (!img) return -5;
  for (int y = 0; y < ih; y++) {
    const uint8_t *row = buf + pix_off + stride * (flip ? (ih - 1 - y) : y);
    uint8_t *dst = img + (size_t)y * iw * 3;
    for (int x = 0; x < iw; x++) {
      dst[3 * x + 0] = row[nb * x + 2];
      dst[3 * x + 1] = row[nb * x + 1];
      dst[3 * x + 2] = row[nb * x + 0];
    }
  }
  *out = img;
  *h = ih;
  *w = iw;
  return 0;
}

static int bmp_encode(FILE *f, const uint8_t *rgb, int h, int w) {
  size_t stride = ((size_t)w * 3 + 3) & ~(size_t)3;
  size_t pix = stride * h;
  uint8_t hdr[54] = {0};
  hdr[0] = 'B';
  hdr[1] = 'M';
  uint32_t fsz = (uint32_t)(54 + pix);
  memcpy(hdr + 2, &fsz, 4);
  uint32_t off = 54;
  memcpy(hdr + 10, &off, 4);
  uint32_t ihsz = 40;
  memcpy(hdr + 14, &ihsz, 4);
  memcpy(hdr + 18, &w, 4);
  memcpy(hdr + 22, &h, 4);
  uint16_t planes = 1, bpp = 24;
  memcpy(hdr + 26, &planes, 2);
  memcpy(hdr + 28, &bpp, 2);
  uint32_t ppm = 2835;
  memcpy(hdr + 34, &pix, 4);
  memcpy(hdr + 38, &ppm, 4);
  memcpy(hdr + 42, &ppm, 4);
  if (fwrite(hdr, 1, 54, f) != 54) return -1;
  uint8_t *row = (uint8_t *)calloc(1, stride);
  if (!row) return -2;
  for (int y = h - 1; y >= 0; y--) {
    const uint8_t *src = rgb + (size_t)y * w * 3;
    for (int x = 0; x < w; x++) {
      row[3 * x + 0] = src[3 * x + 2];
      row[3 * x + 1] = src[3 * x + 1];
      row[3 * x + 2] = src[3 * x + 0];
    }
    if (fwrite(row, 1, stride, f) != stride) {
      free(row);
      return -3;
    }
  }
  free(row);
  return 0;
}

// ---------------------------------------------------------------------------
// PNG (libpng)
// ---------------------------------------------------------------------------

static int png_decode_file(FILE *f, uint8_t **out, int *h, int *w) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  // volatile: these must survive the longjmp so the error branch can free
  // whatever was allocated before libpng bailed.
  uint8_t *volatile img = nullptr;
  png_bytep *volatile rows = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    free(rows);
    free(img);
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 iw = png_get_image_width(png, info);
  png_uint_32 ih = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int ctype = png_get_color_type(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (ctype == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (ctype == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (ctype == PNG_COLOR_TYPE_GRAY || ctype == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  size_t rb = png_get_rowbytes(png, info);
  if (rb != (size_t)iw * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -3;
  }
  img = (uint8_t *)malloc((size_t)iw * ih * 3);
  if (!img) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -4;
  }
  rows = (png_bytep *)malloc(sizeof(png_bytep) * ih);
  if (!rows) {
    free(img);
    png_destroy_read_struct(&png, &info, nullptr);
    return -4;
  }
  for (png_uint_32 y = 0; y < ih; y++) rows[y] = img + (size_t)y * iw * 3;
  png_read_image(png, rows);
  png_read_end(png, nullptr);
  free(rows);
  rows = nullptr;
  png_destroy_read_struct(&png, &info, nullptr);
  *out = img;
  *h = (int)ih;
  *w = (int)iw;
  return 0;
}

static int png_encode_file(FILE *f, const uint8_t *rgb, int h, int w) {
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    return -2;
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  for (int y = 0; y < h; y++)
    png_write_row(png, (png_const_bytep)(rgb + (size_t)y * w * 3));
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  return 0;
}

// ---------------------------------------------------------------------------
// PPM (P6)
// ---------------------------------------------------------------------------

// netpbm header int: skips whitespace AND '#' comment lines (spec-valid
// files written by GIMP et al. carry them); returns -1 on parse failure.
static int ppm_int(FILE *f, int *val) {
  int c;
  for (;;) {
    c = fgetc(f);
    if (c == '#') {
      while (c != '\n' && c != EOF) c = fgetc(f);
    } else if (c != ' ' && c != '\t' && c != '\n' && c != '\r') {
      break;
    }
  }
  if (c < '0' || c > '9') return -1;
  int v = 0;
  while (c >= '0' && c <= '9') {
    v = v * 10 + (c - '0');
    if (v > (1 << 30)) return -1;
    c = fgetc(f);
  }
  if (c != EOF) ungetc(c, f);
  *val = v;
  return 0;
}

static int ppm_decode(FILE *f, uint8_t **out, int *h, int *w) {
  int iw, ih, maxv;
  char m0 = fgetc(f), m1 = fgetc(f);
  if (m0 != 'P' || m1 != '6') return -1;
  if (ppm_int(f, &iw) || ppm_int(f, &ih) || ppm_int(f, &maxv) || maxv != 255)
    return -1;
  // reject non-positive or absurd dims (bogus malloc size otherwise)
  if (iw <= 0 || ih <= 0 || (int64_t)iw * ih > (int64_t)1 << 32) return -1;
  fgetc(f);  // single whitespace
  size_t n = (size_t)iw * ih * 3;
  uint8_t *img = (uint8_t *)malloc(n);
  if (!img) return -2;
  if (fread(img, 1, n, f) != n) {
    free(img);
    return -3;
  }
  *out = img;
  *h = ih;
  *w = iw;
  return 0;
}

static int ppm_encode(FILE *f, const uint8_t *rgb, int h, int w) {
  if (fprintf(f, "P6\n%d %d\n255\n", w, h) < 0) return -1;
  size_t n = (size_t)w * h * 3;
  return fwrite(rgb, 1, n, f) == n ? 0 : -1;
}

// ---------------------------------------------------------------------------
// Format dispatch
// ---------------------------------------------------------------------------

static int has_suffix(const char *s, const char *suf) {
  size_t ls = strlen(s), lf = strlen(suf);
  if (lf > ls) return 0;
  for (size_t i = 0; i < lf; i++) {
    char a = s[ls - lf + i], b = suf[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != b) return 0;
  }
  return 1;
}

// -> 0 ok; out = malloc'd RGB8
int iek_imread(const char *path, uint8_t **out, int *h, int *w) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  int rc = -100;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    rc = png_decode_file(f, out, h, w);
  } else if (got >= 2 && magic[0] == 'B' && magic[1] == 'M') {
    fseek(f, 0, SEEK_END);
    long len = ftell(f);
    rewind(f);
    uint8_t *buf = (uint8_t *)malloc(len);
    if (buf && fread(buf, 1, len, f) == (size_t)len)
      rc = bmp_decode(buf, len, out, h, w);
    free(buf);
  } else if (got >= 2 && magic[0] == 'P' && magic[1] == '6') {
    rc = ppm_decode(f, out, h, w);
  }
  fclose(f);
  return rc;
}

int iek_imwrite(const char *path, const uint8_t *rgb, int h, int w) {
  // dispatch BEFORE opening: fopen("wb") truncates, so an unsupported
  // suffix must not destroy a pre-existing file at the path
  int kind = has_suffix(path, ".png")   ? 0
             : has_suffix(path, ".bmp") ? 1
             : has_suffix(path, ".ppm") ? 2
                                        : -1;
  if (kind < 0) return -50;
  FILE *f = fopen(path, "wb");
  if (!f) return -1;
  int rc = kind == 0   ? png_encode_file(f, rgb, h, w)
           : kind == 1 ? bmp_encode(f, rgb, h, w)
                       : ppm_encode(f, rgb, h, w);
  // fclose flushes the stdio buffer: a disk-full failure surfaces HERE,
  // not in the buffered writes — success must include the flush
  if (fclose(f) != 0 && rc == 0) rc = -60;
  return rc;
}

// ---------------------------------------------------------------------------
// Threaded batch loader
// ---------------------------------------------------------------------------

typedef struct {
  const char *const *paths;
  uint8_t **outs;
  int *hs;
  int *ws;
  int *rcs;
  int n;
  int next;  // work index
  pthread_mutex_t mu;
} batch_job;

static void *batch_worker(void *arg) {
  batch_job *job = (batch_job *)arg;
  for (;;) {
    pthread_mutex_lock(&job->mu);
    int i = job->next++;
    pthread_mutex_unlock(&job->mu);
    if (i >= job->n) break;
    job->rcs[i] = iek_imread(job->paths[i], &job->outs[i], &job->hs[i], &job->ws[i]);
  }
  return nullptr;
}

// Decode n files concurrently with `threads` workers.
// outs/hs/ws/rcs are caller-allocated arrays of length n.
int iek_imread_batch(const char *const *paths, int n, int threads,
                     uint8_t **outs, int *hs, int *ws, int *rcs) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  batch_job job = {paths, outs, hs, ws, rcs, n, 0, PTHREAD_MUTEX_INITIALIZER};
  pthread_t tids[64];
  if (threads > 64) threads = 64;
  int created = 0;
  for (int t = 0; t < threads; t++) {
    if (pthread_create(&tids[created], nullptr, batch_worker, &job) == 0)
      created++;  // EAGAIN under thread exhaustion: run with fewer workers
  }
  if (created == 0) batch_worker(&job);  // inline fallback, never silent
  for (int t = 0; t < created; t++) pthread_join(tids[t], nullptr);
  int bad = 0;
  for (int i = 0; i < n; i++)
    if (rcs[i] != 0) bad++;
  return bad;
}

// ---------------------------------------------------------------------------
// Patch sampling (host-side training hot loop)
// ---------------------------------------------------------------------------

// Copy `count` patches of size (p, p, 3) from an RGB image into `dst`
// (count * p * p * 3 bytes) given top-left corners ys/xs.  Corners are
// clamped into [0, h-p] x [0, w-p] so no request can read past the buffer;
// returns the number of corners that had to be clamped (0 = all in range),
// or -1 if the patch doesn't fit the image at all.
int iek_gather_patches(const uint8_t *img, int h, int w, const int *ys,
                       const int *xs, int count, int p, uint8_t *dst) {
  if (p <= 0 || p > h || p > w) return -1;
  int clamped = 0;
  for (int k = 0; k < count; k++) {
    int y = ys[k], x = xs[k];
    if (y < 0 || x < 0 || y > h - p || x > w - p) {
      y = y < 0 ? 0 : (y > h - p ? h - p : y);
      x = x < 0 ? 0 : (x > w - p ? w - p : x);
      clamped++;
    }
    const uint8_t *src0 = img + ((size_t)y * w + x) * 3;
    uint8_t *d = dst + (size_t)k * p * p * 3;
    for (int r = 0; r < p; r++)
      memcpy(d + (size_t)r * p * 3, src0 + (size_t)r * w * 3, (size_t)p * 3);
  }
  return clamped;
}

}  // extern "C"
