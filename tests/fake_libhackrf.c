/* In-tree fake libhackrf for driving the third dlopen device backend
 * end-to-end without hardware (the library the reference's hackrf-handler
 * loads at runtime, devices/hackrf-handler/hackrf-handler.cpp:433-555).
 *
 * Behaviour:
 *   - hackrf_open succeeds unless FAKE_HACKRF_PRESENT=0
 *   - hackrf_set_sample_rate records the requested double (the backend
 *     must ask for exactly 2304000.0, hackrf-handler.cpp:112)
 *   - hackrf_start_rx spawns a pthread delivering SIGNED 8-bit IQ
 *     transfers from the file FAKE_HACKRF_IQ, paced at FAKE_HACKRF_FPS
 *     frames/s (default the set sample rate); loops at EOF unless
 *     FAKE_HACKRF_LOOP=0 (then a final valid_length==0 transfer marks
 *     end-of-capture); callback returning nonzero stops streaming
 *   - setters record their last values (fake_hackrf_last_* exports)
 *
 * Build (tests do this): cc -shared -fPIC -O2 -o libfakehackrf.so \
 *     fake_libhackrf.c -lpthread
 */

#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

/* exact vendor ABI (devices/hackrf-handler/libhackrf/hackrf.h:110-117) */
struct hackrf_transfer {
  void *device;
  uint8_t *buffer;
  int buffer_length;
  int valid_length;
  void *rx_ctx;
  void *tx_ctx;
};
typedef int (*hackrf_cb_t)(struct hackrf_transfer *);

struct fake_hackrf {
  double rate;
  uint64_t freq;
  uint32_t lna, vga, bb_bw;
  int amp, antenna;
  hackrf_cb_t cb;
  void *cb_ctx;
  pthread_t thread;
  volatile int streaming;
};

static struct fake_hackrf g_dev;

int hackrf_init(void) { return 0; }
int hackrf_exit(void) { return 0; }

int hackrf_open(void **dev) {
  const char *p = getenv("FAKE_HACKRF_PRESENT");
  if (p && atoi(p) == 0) return -5;
  memset(&g_dev, 0, sizeof(g_dev));
  *dev = &g_dev;
  return 0;
}

int hackrf_close(void *dev) { (void)dev; return 0; }

int hackrf_set_sample_rate(void *dev, double rate) {
  ((struct fake_hackrf *)dev)->rate = rate;
  return 0;
}

uint32_t hackrf_compute_baseband_filter_bw(uint32_t bw_hint) {
  /* libhackrf quantizes to a valid filter table entry; the fake just
   * echoes (the backend only passes it through) */
  return bw_hint;
}

int hackrf_set_baseband_filter_bandwidth(void *dev, uint32_t bw) {
  ((struct fake_hackrf *)dev)->bb_bw = bw;
  return 0;
}

int hackrf_set_freq(void *dev, uint64_t hz) {
  ((struct fake_hackrf *)dev)->freq = hz;
  return 0;
}

int hackrf_set_lna_gain(void *dev, uint32_t g) {
  ((struct fake_hackrf *)dev)->lna = g;
  return 0;
}
int hackrf_set_vga_gain(void *dev, uint32_t g) {
  ((struct fake_hackrf *)dev)->vga = g;
  return 0;
}
int hackrf_set_amp_enable(void *dev, uint8_t on) {
  ((struct fake_hackrf *)dev)->amp = on;
  return 0;
}
int hackrf_set_antenna_enable(void *dev, uint8_t on) {
  ((struct fake_hackrf *)dev)->antenna = on;
  return 0;
}

double fake_hackrf_last_rate(void) { return g_dev.rate; }
uint64_t fake_hackrf_last_freq(void) { return g_dev.freq; }
uint32_t fake_hackrf_last_lna(void) { return g_dev.lna; }
uint32_t fake_hackrf_last_vga(void) { return g_dev.vga; }
int fake_hackrf_last_amp(void) { return g_dev.amp; }

static void *stream_main(void *arg) {
  struct fake_hackrf *d = arg;
  enum { CHUNK = 8192 }; /* frames per transfer */
  uint8_t *buf = malloc(CHUNK * 2);
  const char *path = getenv("FAKE_HACKRF_IQ");
  const char *loop_env = getenv("FAKE_HACKRF_LOOP");
  int loop = loop_env ? atoi(loop_env) : 1;
  const char *fps_env = getenv("FAKE_HACKRF_FPS");
  double fps = fps_env ? atof(fps_env)
                       : (d->rate > 0 ? d->rate : 2304000.0);
  FILE *f = path ? fopen(path, "rb") : NULL;
  while (d->streaming) {
    size_t got_frames;
    if (f) {
      got_frames = fread(buf, 2, CHUNK, f);
      if (got_frames == 0) {
        if (loop) {
          rewind(f);
          continue;
        }
        break;
      }
    } else {
      memset(buf, 0, CHUNK * 2);
      got_frames = CHUNK;
    }
    struct hackrf_transfer t = {d,        buf, CHUNK * 2,
                                (int)(got_frames * 2), d->cb_ctx, NULL};
    if (d->cb(&t) != 0) {
      d->streaming = 0;
      break;
    }
    if (fps > 0) {
      double sec = (double)got_frames / fps;
      struct timespec ts;
      ts.tv_sec = (time_t)sec;
      ts.tv_nsec = (long)((sec - (double)ts.tv_sec) * 1e9);
      nanosleep(&ts, NULL);
    }
  }
  if (d->streaming && d->cb) { /* end-of-capture marker (fake-only) */
    struct hackrf_transfer t = {d, buf, 0, 0, d->cb_ctx, NULL};
    d->cb(&t);
  }
  if (f) fclose(f);
  free(buf);
  return NULL;
}

int hackrf_start_rx(void *dev, hackrf_cb_t cb, void *ctx) {
  struct fake_hackrf *d = dev;
  if (d->streaming) return -1;
  d->cb = cb;
  d->cb_ctx = ctx;
  d->streaming = 1;
  if (pthread_create(&d->thread, NULL, stream_main, d) != 0) {
    d->streaming = 0;
    return -1;
  }
  return 0;
}

int hackrf_stop_rx(void *dev) {
  struct fake_hackrf *d = dev;
  if (!d->streaming && !d->thread) return 0;
  d->streaming = 0;
  if (d->thread) {
    pthread_join(d->thread, NULL);
    d->thread = 0;
  }
  return 0;
}

int hackrf_is_streaming(void *dev) {
  return ((struct fake_hackrf *)dev)->streaming;
}

const char *hackrf_error_name(int err) {
  (void)err;
  return "fake hackrf error";
}
