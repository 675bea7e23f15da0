package neo4jexportspark.io;

import java.io.IOException;
import java.io.InputStream;
import java.io.OutputStream;

import org.apache.hadoop.conf.Configurable;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.io.compress.CompressionCodec;
import org.apache.hadoop.io.compress.CompressionInputStream;
import org.apache.hadoop.io.compress.CompressionOutputStream;
import org.apache.hadoop.io.compress.Compressor;
import org.apache.hadoop.io.compress.Decompressor;

import com.github.luben.zstd.ZstdInputStream;
import com.github.luben.zstd.ZstdOutputStream;

/**
 * Hadoop CompressionCodec backed by zstd-jni (already on every Spark
 * classpath), so Spark task threads can write and read `.zst` text parts
 * natively — no Hadoop native library required.
 *
 * Each part file is one (or more, when concatenated) RFC 8878 zstd frame;
 * frames concatenate like gzip members, so a driver-side concat of part
 * files is itself a valid `.zst` stream.  Non-splittable (plain
 * CompressionCodec, not SplittableCompressionCodec): one read task per
 * part file, which matches how the parts were written.
 *
 * The Compressor/Decompressor types exist only to satisfy CodecPool
 * lookups on the line-reader path; the real work happens inside the
 * stream wrappers.
 */
public class ZstdFrameCodec implements CompressionCodec, Configurable {
  private Configuration conf;

  @Override public void setConf(Configuration c) { this.conf = c; }
  @Override public Configuration getConf() { return conf; }

  @Override
  public CompressionOutputStream createOutputStream(OutputStream out) throws IOException {
    return new ZstdFrameOutputStream(out);
  }

  @Override
  public CompressionOutputStream createOutputStream(OutputStream out, Compressor c)
      throws IOException {
    return new ZstdFrameOutputStream(out);
  }

  @Override public Class<? extends Compressor> getCompressorType() {
    return PassthroughCompressor.class;
  }

  @Override public Compressor createCompressor() { return new PassthroughCompressor(); }

  @Override
  public CompressionInputStream createInputStream(InputStream in) throws IOException {
    return new ZstdFrameInputStream(in);
  }

  @Override
  public CompressionInputStream createInputStream(InputStream in, Decompressor d)
      throws IOException {
    return new ZstdFrameInputStream(in);
  }

  @Override public Class<? extends Decompressor> getDecompressorType() {
    return PassthroughDecompressor.class;
  }

  @Override public Decompressor createDecompressor() { return new PassthroughDecompressor(); }

  @Override public String getDefaultExtension() { return ".zst"; }

  /** FilterOutputStream whose close() only flushes — lets finish() close
   *  the zstd wrapper (the only way zstd-jni ends a frame) while keeping
   *  the real underlying stream open, per the CompressionOutputStream
   *  contract. */
  private static final class CloseShieldOutputStream extends java.io.FilterOutputStream {
    CloseShieldOutputStream(OutputStream out) { super(out); }
    @Override public void write(byte[] b, int off, int len) throws IOException {
      out.write(b, off, len);
    }
    @Override public void close() throws IOException { out.flush(); }
  }

  public static final class ZstdFrameOutputStream extends CompressionOutputStream {
    private ZstdOutputStream zos;  // null between finish() and the next write

    public ZstdFrameOutputStream(OutputStream out) throws IOException {
      super(out);
      this.zos = new ZstdOutputStream(new CloseShieldOutputStream(out));
    }

    private ZstdOutputStream ensureOpen() throws IOException {
      if (zos == null) {
        // writes after finish() open a fresh frame; frames concatenate
        // per RFC 8878, so the file stays one valid .zst stream
        zos = new ZstdOutputStream(new CloseShieldOutputStream(out));
      }
      return zos;
    }

    @Override public void write(int b) throws IOException { ensureOpen().write(b); }

    @Override public void write(byte[] b, int off, int len) throws IOException {
      ensureOpen().write(b, off, len);
    }

    @Override public void finish() throws IOException {
      // End the current zstd frame WITHOUT closing the underlying stream
      // (the CompressionOutputStream.finish() contract).  Idempotent.
      if (zos != null) {
        zos.close();  // close-shielded: ends the frame, flushes, keeps out open
        zos = null;
      }
    }

    @Override public void resetState() throws IOException { /* stateless between records */ }

    @Override public void flush() throws IOException {
      if (zos != null) { zos.flush(); } else { out.flush(); }
    }

    @Override public void close() throws IOException {
      finish();
      out.close();
    }
  }

  public static final class ZstdFrameInputStream extends CompressionInputStream {
    private final ZstdInputStream zis;

    public ZstdFrameInputStream(InputStream in) throws IOException {
      super(in);
      this.zis = new ZstdInputStream(in);
      // continue across concatenated frames (single-file exports are a
      // concat of per-part frames plus metadata/tail frames)
      this.zis.setContinuous(true);
    }

    @Override public int read() throws IOException { return zis.read(); }

    @Override public int read(byte[] b, int off, int len) throws IOException {
      return zis.read(b, off, len);
    }

    @Override public int available() throws IOException { return zis.available(); }

    @Override public void resetState() throws IOException { /* frame-at-a-time */ }

    @Override public void close() throws IOException { zis.close(); }
  }

  /** Satisfies CodecPool; never drives compression (streams do the work). */
  public static final class PassthroughCompressor implements Compressor {
    @Override public void setInput(byte[] b, int off, int len) { }
    @Override public boolean needsInput() { return true; }
    @Override public void setDictionary(byte[] b, int off, int len) { }
    @Override public long getBytesRead() { return 0; }
    @Override public long getBytesWritten() { return 0; }
    @Override public void finish() { }
    @Override public boolean finished() { return true; }
    @Override public int compress(byte[] b, int off, int len) { return 0; }
    @Override public void reset() { }
    @Override public void end() { }
    @Override public void reinit(Configuration conf) { }
  }

  /** Satisfies CodecPool; never drives decompression (streams do the work). */
  public static final class PassthroughDecompressor implements Decompressor {
    @Override public void setInput(byte[] b, int off, int len) { }
    @Override public boolean needsInput() { return true; }
    @Override public void setDictionary(byte[] b, int off, int len) { }
    @Override public boolean needsDictionary() { return false; }
    @Override public boolean finished() { return true; }
    @Override public int decompress(byte[] b, int off, int len) { return 0; }
    @Override public int getRemaining() { return 0; }
    @Override public void reset() { }
    @Override public void end() { }
  }
}
