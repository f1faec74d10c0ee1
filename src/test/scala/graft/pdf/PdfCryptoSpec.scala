package graft.pdf

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class PdfCryptoSpec extends AnyFunSuite {

  /** The q19 one-page frame grammar with a known text line. */
  private def clearPdf(text: String): Array[Byte] = {
    val content = s"BT /F1 12 Tf 72 720 Td ($text) Tj ET"
    ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n%%EOF\n")
      .getBytes(StandardCharsets.US_ASCII)
  }

  test("RC4 is symmetric and matches its defining state machine") {
    val key = Array[Byte](1, 2, 3, 4, 5)
    val msg = "the quick brown fox".getBytes(StandardCharsets.US_ASCII)
    val enc = PdfCrypto.rc4(key, msg)
    assert(!java.util.Arrays.equals(enc, msg))
    assert(java.util.Arrays.equals(PdfCrypto.rc4(key, enc), msg))
  }

  test("V1/40 and V2/128 round-trip: encrypt → tryDecrypt → extract the known text") {
    Seq(1, 2).foreach { v =>
      val clear = clearPdf(s"secret v$v text line")
      val enc = PdfCrypto.encryptRc4(clear, v = v)
      // the ciphertext must not contain the plaintext line
      assert(!new String(enc, StandardCharsets.ISO_8859_1).contains("secret"))
      // preflight must flag it (the /Encrypt marker rides the trailer)
      assert(PdfExtract.preflight(enc).encrypted, s"v$v preflight missed /Encrypt")
      val dec = PdfCrypto.tryDecrypt(enc)
      assert(dec.isDefined, s"v$v decrypt failed")
      val got = PdfExtract.outcome(dec.get)
      assert(got.error == null && got.text == s"secret v$v text line", got.toString)
    }
  }

  test("V4/AESV2 and V5/R6 AESV3 round-trip through the JDK cipher path") {
    Seq(4, 5).foreach { v =>
      val clear = clearPdf(s"aes v$v secret")
      val enc = PdfCrypto.encryptAes(clear, v = v)
      assert(!new String(enc, StandardCharsets.ISO_8859_1).contains("aes v"))
      assert(PdfExtract.preflight(enc).encrypted)
      val dec = PdfCrypto.tryDecrypt(enc)
      assert(dec.isDefined, s"v$v decrypt failed")
      val got = PdfExtract.outcome(dec.get)
      assert(got.error == null && got.text == s"aes v$v secret", got.toString)
      // corrupted /U refuses
      assert(PdfCrypto.tryDecrypt(PdfCrypto.encryptAes(clear, v = v, corruptU = true)).isEmpty)
    }
  }

  test("AES on a flate multi-object fixture: decrypted extraction equals clear") {
    val p = (0 until 40).map(i => graft.fixtures.CorpusGen.page(i.toLong, 42))
      .find(_.kind == "pdf").get
    Seq(4, 5).foreach { v =>
      val enc = PdfCrypto.encryptAes(p.html, v = v)
      val dec = PdfCrypto.tryDecrypt(enc)
      assert(dec.isDefined, s"v$v")
      assert(PdfExtract.outcome(dec.get).text == PdfExtract.outcome(p.html).text, s"v$v")
    }
  }

  test("a real user password (corrupted /U) refuses the empty password") {
    val enc = PdfCrypto.encryptRc4(clearPdf("locked"), v = 2, corruptU = true)
    assert(PdfCrypto.tryDecrypt(enc).isEmpty)
  }

  test("non-encrypted and hostile inputs return None, never throw") {
    assert(PdfCrypto.tryDecrypt(clearPdf("plain")).isEmpty)
    assert(PdfCrypto.tryDecrypt(null).isEmpty)
    assert(PdfCrypto.tryDecrypt(Array.emptyByteArray).isEmpty)
    val rnd = new scala.util.Random(99)
    (0 until 100).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(junk)
      PdfCrypto.tryDecrypt(junk)
    }
    // truncations of a valid encrypted file
    val enc = PdfCrypto.encryptRc4(clearPdf("trunc"), v = 2)
    (0 until enc.length by 13).foreach(cut => PdfCrypto.tryDecrypt(enc.take(cut)))
  }

  test("multi-object PDFs with binary (flate) streams survive the frame walk") {
    // a CorpusGen fixture page: multiple objects, flate-compressed content —
    // binary stream bytes must not derail the sequential frame walk
    val page = graft.fixtures.CorpusGen.page(7, 42)
    if (page.kind == "pdf") {
      val enc = PdfCrypto.encryptRc4(page.html, v = 2)
      val dec = PdfCrypto.tryDecrypt(enc)
      assert(dec.isDefined)
      assert(PdfExtract.outcome(dec.get).text == PdfExtract.outcome(page.html).text)
    }
    // force a pdf fixture deterministically: scan a few indices for pdf kind
    val pdfPage = (0 until 40).map(i => graft.fixtures.CorpusGen.page(i.toLong, 42))
      .find(_.kind == "pdf")
    assert(pdfPage.isDefined, "no pdf page in the first 40 fixture indices")
    val p = pdfPage.get
    val enc2 = PdfCrypto.encryptRc4(p.html, v = 1)
    val dec2 = PdfCrypto.tryDecrypt(enc2)
    assert(dec2.isDefined)
    assert(PdfExtract.outcome(dec2.get).text == PdfExtract.outcome(p.html).text,
      "decrypted extraction must equal the clear extraction")
  }
}
