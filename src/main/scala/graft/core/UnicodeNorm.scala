package graft.core

/** Unicode canonical composition (NFC), the normalization a multilingual
  * corpus needs before content fingerprinting: decomposed and precomposed
  * spellings of the same grapheme must hash identically or dedup misses
  * every cross-encoding duplicate. JDK-only (java.text.Normalizer) so the
  * kernel works offline; static entry point so codegen'd callers emit a
  * single static call.
  */
object UnicodeNorm {
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}
