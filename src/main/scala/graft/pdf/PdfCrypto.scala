package graft.pdf

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.util.control.NonFatal

/**
 * PDF standard security handler (ISO 32000-1 §7.6.3) for the EMPTY user
 * password — the case that matters for crawl data: owner-password-only
 * "protected" PDFs are readable by every conforming reader, and a large
 * share of encrypted PDFs in the wild are exactly that. V1/V2 (RC4 40-128
 * bit), revisions 2 and 3. The reference pipeline quarantines every
 * encrypted PDF (security_validator.py:417-439); this recovers the
 * readable subset first.
 *
 * Everything here is formula-defined from the public spec: the 32-byte
 * padding string (§7.6.3.3), the MD5/RC4 key-derivation algorithms 1-5
 * (MD5 from the JDK, RC4 is ten lines of state machine), the V5/R5-R6
 * SHA-2-based Algorithm 2.A/2.B hashes, and AES-128/256-CBC from the JDK.
 * All four standard-handler schemes are supported: V1/V2 RC4 (R2/R3),
 * V4/R4 crypt filters with /AESV2 or /V2-RC4 StdCF, and V5 /AESV3 (R5 and
 * the ISO 32000-2 R6 iterated hash). RC4 decrypts IN PLACE (length-
 * preserving — offsets, /Length values, and xref tables stay valid); AES
 * output is shorter than the stored region (IV + padding), so the
 * shortfall pads with inert newlines. Either way the existing scan-based
 * extractor reads the decrypted copy unchanged. Unsupported or
 * wrong-password files return None and stay on the quarantine path. */
object PdfCrypto {

  /** The spec's password padding string (§7.6.3.3). */
  private[pdf] val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 (symmetric — encrypts and decrypts). */
  private[pdf] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** Parsed /Encrypt dictionary (standard handler, V ≤ 4 key schedule). */
  final case class StdCrypt(v: Int, r: Int, lengthBits: Int,
                            o: Array[Byte], u: Array[Byte], p: Int,
                            id0: Array[Byte], metaFalse: Boolean = false)

  /** Algorithm 2: the file encryption key for the EMPTY user password. */
  private[pdf] def fileKey(c: StdCrypt): Array[Byte] = {
    val n = math.max(5, math.min(16, c.lengthBits / 8))
    val pLe = Array((c.p & 0xff).toByte, ((c.p >> 8) & 0xff).toByte,
      ((c.p >> 16) & 0xff).toByte, ((c.p >> 24) & 0xff).toByte)
    // R4 with /EncryptMetadata false appends ffffffff (§7.6.3.3 step f)
    var digest =
      if (c.r >= 4 && c.metaFalse)
        md5(Pad, c.o, pLe, c.id0, Array.fill(4)(0xff.toByte))
      else md5(Pad, c.o, pLe, c.id0)
    if (c.r >= 3) {
      var i = 0
      while (i < 50) { digest = md5(digest.take(n)); i += 1 }
    }
    digest.take(n)
  }

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("SHA-256")
    parts.foreach(d.update)
    d.digest()
  }

  /** Raw AES-CBC (no padding) via the JDK; `data` length must be a multiple
    * of 16 — callers validate. */
  private def aesCbcRaw(key: Array[Byte], iv: Array[Byte], data: Array[Byte],
                        encrypt: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** AES stream decryption (§7.6.2): data = 16-byte IV ++ CBC ciphertext
    * with CMS padding; malformed sizes return empty (the total stance). */
  private def aesStreamDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length - 16) % 16 != 0) return Array.emptyByteArray
    val iv = data.take(16)
    val dec = aesCbcRaw(key, iv, java.util.Arrays.copyOfRange(data, 16, data.length),
      encrypt = false)
    val pad = dec.last & 0xff
    if (pad < 1 || pad > 16 || pad > dec.length) Array.emptyByteArray
    else dec.dropRight(pad)
  }

  /** AESV2 per-object key: MD5(fileKey ++ obj3 ++ gen2 ++ "sAlT") (§7.6.2). */
  private def objectKeyAes(key: Array[Byte], num: Int, gen: Int): Array[Byte] = {
    val ext = Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte,
      0x73.toByte, 0x41.toByte, 0x6c.toByte, 0x54.toByte)
    md5(key, ext).take(math.min(key.length + 5, 16))
  }

  /** Algorithm 2.B (R6 iterated hash): SHA-256/384/512 rounds steered by an
    * AES-128-CBC pass — every step a JDK primitive, no table data. */
  private[pdf] def hash2B(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    var k = sha256(pwd, salt, udata)
    var round = 0
    var lastE = 0
    var done = false
    while (!done) {
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1 }
      val e = aesCbcRaw(k.take(16), k.slice(16, 32), k1, encrypt = true)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xff; i += 1 }
      val d = MessageDigest.getInstance(sum % 3 match {
        case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512"
      })
      k = d.digest(e)
      lastE = e(e.length - 1) & 0xff
      round += 1
      done = round >= 64 && lastE <= round - 32
      if (round > 1024) done = true // hostile-input bound; real files stop ≤ ~80
    }
    k.take(32)
  }

  /** First /ID string from the newest trailer occurrence. */
  private def trailerId0(s: String): Array[Byte] = {
    val idAt = s.lastIndexOf("/ID")
    if (idAt < 0) Array.emptyByteArray
    else pdfString(s.substring(idAt, math.min(s.length, idAt + 200)), "/ID")
      .getOrElse(Array.emptyByteArray)
  }

  /** Algorithms 4/5: does the EMPTY user password open this file? */
  private[pdf] def emptyUserPasswordOk(c: StdCrypt): Boolean = {
    val key = fileKey(c)
    if (c.r == 2) java.util.Arrays.equals(rc4(key, Pad), c.u)
    else {
      var u = md5(Pad, c.id0)
      u = rc4(key, u)
      var i = 1
      while (i <= 19) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      c.u.length >= 16 && java.util.Arrays.equals(u.take(16), c.u.take(16))
    }
  }

  /** Algorithm 1: the per-object RC4 key. */
  private[pdf] def objectKey(key: Array[Byte], num: Int, gen: Int): Array[Byte] = {
    val ext = Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    md5(key, ext).take(math.min(key.length + 5, 16))
  }

  // ------------------------------------------------------------- decryption

  /** Attempt empty-user-password decryption: returns the clear bytes (every
    * stream payload decrypted in place — RC4 is length-preserving; AES pads
    * its shortfall with newlines — so offsets, /Length values, and xref
    * tables stay valid) or None when the file is not encrypted, uses a
    * scheme outside the four standard-handler forms (V1/V2 RC4, V4 AESV2 or
    * cf-RC4, V5 AESV3 R5/R6), or genuinely requires a non-empty user
    * password. Never throws. */
  def tryDecrypt(bytes: Array[Byte]): Option[Array[Byte]] =
    try tryDecryptImpl(bytes) catch { case NonFatal(_) => None }

  private def latin1(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, math.max(0, until - from), StandardCharsets.ISO_8859_1)

  private def tryDecryptImpl(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 64) return None
    // the frame walk works over a latin-1 view (2 bytes/char): cap the
    // attempt at 64 MB so 32 concurrent hostile 100 MB payloads cannot
    // spike executor memory — larger encrypted files stay quarantined
    if (bytes.length > (64 << 20)) return None
    // non-PDF payloads bail BEFORE the 2-bytes/char String view is built —
    // on a mixed corpus the magic check keeps the transient doubling a
    // per-PDF cost (same startsWith-"%PDF-" contract as the preflight)
    if (bytes(0) != '%' || bytes(1) != 'P' || bytes(2) != 'D' ||
        bytes(3) != 'F' || bytes(4) != '-') return None
    val s = latin1(bytes, 0, bytes.length)
    val encAt = s.lastIndexOf("/Encrypt")
    if (encAt < 0) return None
    val refM = """/Encrypt\s+(\d+)\s+(\d+)\s+R""".r
      .findFirstMatchIn(s.substring(encAt, math.min(s.length, encAt + 64)))
      .getOrElse(return None)
    val (eNum, eGen) = (refM.group(1).toInt, refM.group(2).toInt)
    val frame = objectFrame(s, eNum, eGen).getOrElse(return None)
    if (!frame.contains("/Standard")) return None
    def intVal(key: String, dflt: Int): Int =
      (key + """\s+(-?\d+)""").r.findFirstMatchIn(frame).map(_.group(1).toInt).getOrElse(dflt)
    val v = intVal("/V", 0)
    val r = intVal("/R", 2)
    val o = pdfString(frame, "/O").getOrElse(return None)
    val u = pdfString(frame, "/U").getOrElse(return None)
    val p = intVal("/P", -1)
    // scheme dispatch: rc4 (V1/2), aesv2 or cf-rc4 (V4 crypt filters),
    // aesv3 (V5) — anything else stays locked
    val scheme: Option[(String, Array[Byte])] =
      if ((v == 1 || v == 2) && (r == 2 || r == 3)) {
        if (o.length < 32 || u.length < 16) return None
        val crypt = StdCrypt(v, r, intVal("/Length", 40), o.take(32), u, p,
          trailerId0(s), metaFalse = false)
        if (!emptyUserPasswordOk(crypt)) None
        else Some(("rc4", fileKey(crypt)))
      } else if (v == 4 && r == 4) {
        // the stream crypt filter must be the StdCF; its method picks the cipher
        if (!frame.contains("/StdCF")) return None
        val cfm =
          if (frame.contains("/AESV2")) "aesv2"
          else if (frame.contains("/V2")) "rc4"
          else return None
        if (o.length < 32 || u.length < 16) return None
        val crypt = StdCrypt(v, r, intVal("/Length", 128), o.take(32), u, p,
          trailerId0(s), metaFalse = frame.contains("/EncryptMetadata false"))
        if (!emptyUserPasswordOk(crypt)) None
        else Some((cfm, fileKey(crypt)))
      } else if (v == 5 && (r == 5 || r == 6)) {
        if (!frame.contains("/AESV3")) return None
        val ue = pdfString(frame, "/UE").getOrElse(return None)
        if (u.length < 48 || ue.length < 32) return None
        val hash = u.take(32)
        val vSalt = u.slice(32, 40)
        val kSalt = u.slice(40, 48)
        val computed =
          if (r == 5) sha256(Array.emptyByteArray, vSalt, Array.emptyByteArray)
          else hash2B(Array.emptyByteArray, vSalt, Array.emptyByteArray)
        if (!java.util.Arrays.equals(computed, hash)) None
        else {
          val ikey =
            if (r == 5) sha256(Array.emptyByteArray, kSalt, Array.emptyByteArray)
            else hash2B(Array.emptyByteArray, kSalt, Array.emptyByteArray)
          Some(("aesv3", aesCbcRaw(ikey, new Array[Byte](16), ue.take(32), encrypt = false)))
        }
      } else None
    val (kind, key) = scheme.getOrElse(return None)
    val out = bytes.clone()
    // decrypt every stream payload in place (strings are not needed for
    // text extraction — content text lives in streams; ObjStm members are
    // covered by decrypting the ObjStm payload itself). AES output is
    // SHORTER than the stored region (IV + CMS padding): the decrypted
    // bytes are written at the region start and the remainder padded with
    // newlines, so offsets and /Length stay valid — flate streams
    // self-terminate and whitespace is inert in every content filter.
    // stream payload ranges collected during the same walk — the breadcrumb
    // rewrite below must skip them (ciphertext/plaintext stream bytes can
    // contain the /Encrypt byte sequence by coincidence)
    val payloadRanges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    walkFrames(s) { (num, gen, dictText, payloadStart, payloadEnd) =>
      if (payloadEnd > payloadStart) payloadRanges += ((payloadStart, payloadEnd))
      // the Encrypt dict's own strings are plaintext; xref streams are
      // never encrypted (§7.5.8.2)
      if ((num != eNum || gen != eGen) && !dictText.contains("/XRef") &&
          payloadEnd > payloadStart) {
        val enc = java.util.Arrays.copyOfRange(bytes, payloadStart, payloadEnd)
        val dec = kind match {
          case "rc4" => rc4(objectKey(key, num, gen), enc)
          case "aesv2" => aesStreamDecrypt(objectKeyAes(key, num, gen), enc)
          case _ => aesStreamDecrypt(key, enc) // aesv3: no per-object salt
        }
        System.arraycopy(dec, 0, out, payloadStart, dec.length)
        var i = payloadStart + dec.length
        while (i < payloadEnd) { out(i) = '\n'.toByte; i += 1 }
      }
    }
    // the recovered file must not re-trip the "encrypted" preflight gate:
    // rewrite EVERY /Encrypt key outside stream payloads to /Decrypt (one
    // byte each, offsets unchanged — a harmless unknown dict key that
    // doubles as the recovery breadcrumb). Every occurrence, not just the
    // last + head window: an incrementally-updated PDF's superseded
    // trailers can also sit inside the preflight's tail-2KB scan, and a
    // recovered file it still flags "encrypted" would be quarantined with
    // the recovery silently wasted. Occurrences INSIDE stream payloads are
    // skipped (walkFrames collected the ranges): those bytes are stream
    // data that merely spells the key by coincidence.
    def inPayload(i: Int): Boolean =
      payloadRanges.exists(r => i >= r._1 && i < r._2)
    var h = s.indexOf("/Encrypt")
    while (h >= 0) {
      if (!inPayload(h)) out(h + 1) = 'D'.toByte
      h = s.indexOf("/Encrypt", h + 1)
    }
    Some(out)
  }

  /** Sequential `num gen obj` frame walk that JUMPS PAST stream payloads —
    * a whole-file regex scan would also match byte sequences INSIDE
    * encrypted stream data and corrupt them with a spurious second pass.
    * Calls `f(num, gen, dictText, payloadStart, payloadEnd)` per frame
    * (payloadStart == payloadEnd when the frame has no stream). */
  private def walkFrames(s: String)(f: (Int, Int, String, Int, Int) => Unit): Unit = {
    val objRe = """(\d+)\s+(\d+)\s+obj""".r
    var pos = 0
    while (pos < s.length) {
      objRe.findFirstMatchIn(s.substring(pos, math.min(s.length, pos + (1 << 20)))) match {
        case None =>
          // nothing in this window: advance (overlap guards a match split
          // across the window edge)
          if (pos + (1 << 20) >= s.length) return
          pos += (1 << 20) - 32
        case Some(m0) =>
          val mStart = pos + m0.start
          val mEnd = pos + m0.end
          val num = m0.group(1).toInt
          val gen = m0.group(2).toInt
          val stRel = s.indexOf("stream", mEnd)
          val endRel = s.indexOf("endobj", mEnd)
          if (endRel >= 0 && (stRel < 0 || endRel < stRel)) {
            // streamless frame
            f(num, gen, s.substring(mEnd, endRel), endRel, endRel)
            pos = endRel + "endobj".length
          } else if (stRel >= 0) {
            var ps = stRel + "stream".length
            if (ps < s.length && s.charAt(ps) == '\r') ps += 1
            if (ps < s.length && s.charAt(ps) == '\n') ps += 1
            val dictText = s.substring(mEnd, stRel)
            val lenM = """/Length\s+(\d+)(?!\s*\d+\s+R)""".r.findFirstMatchIn(dictText)
            val pe = lenM match {
              case Some(lm) => math.min(ps + lm.group(1).toLong, s.length.toLong).toInt
              case None =>
                val es = s.indexOf("endstream", ps)
                if (es < 0) s.length
                else {
                  var e = es
                  if (e > ps && s.charAt(e - 1) == '\n') e -= 1
                  if (e > ps && s.charAt(e - 1) == '\r') e -= 1
                  e
                }
            }
            f(num, gen, dictText, ps, pe)
            val eo = s.indexOf("endobj", pe)
            pos = if (eo < 0) pe else eo + "endobj".length
          } else {
            f(num, gen, s.substring(mEnd), mEnd, mEnd)
            return
          }
      }
    }
  }

  /** Last `num gen obj … endobj` frame body (newest revision wins). */
  private def objectFrame(s: String, num: Int, gen: Int): Option[String] = {
    val pat = s"""(?s)(?<![0-9])$num\\s+$gen\\s+obj\\b""".r
    val ms = pat.findAllMatchIn(s).toSeq
    if (ms.isEmpty) return None
    val m = ms.last
    val end = s.indexOf("endobj", m.end)
    Some(s.substring(m.end, if (end < 0) s.length else end))
  }

  /** First string value after `key` in `dict` text: <hex> or (literal with
    * backslash escapes incl. octal). */
  private def pdfString(dict: String, key: String): Option[Array[Byte]] = {
    val at = dict.indexOf(key)
    if (at < 0) return None
    var i = at + key.length
    while (i < dict.length && (dict.charAt(i).isWhitespace || dict.charAt(i) == '[')) i += 1
    if (i >= dict.length) return None
    dict.charAt(i) match {
      case '<' =>
        val end = dict.indexOf('>', i + 1)
        if (end < 0) return None
        val hex = dict.substring(i + 1, end).filterNot(_.isWhitespace)
        val padded = if (hex.length % 2 == 1) hex + "0" else hex
        Some(padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray)
      case '(' =>
        val out = new java.io.ByteArrayOutputStream()
        var j = i + 1
        var depth = 1
        while (j < dict.length && depth > 0) {
          val c = dict.charAt(j)
          if (c == '\\' && j + 1 < dict.length) {
            val e = dict.charAt(j + 1)
            e match {
              case 'n' => out.write('\n'); j += 2
              case 'r' => out.write('\r'); j += 2
              case 't' => out.write('\t'); j += 2
              case 'b' => out.write('\b'); j += 2
              case 'f' => out.write('\f'); j += 2
              case d if d >= '0' && d <= '7' =>
                var k = j + 1
                var v = 0
                var nd = 0
                while (k < dict.length && nd < 3 && dict.charAt(k) >= '0' && dict.charAt(k) <= '7') {
                  v = v * 8 + (dict.charAt(k) - '0'); k += 1; nd += 1
                }
                out.write(v & 0xff); j = k
              case other => out.write(other); j += 2
            }
          } else if (c == '(') { depth += 1; out.write(c); j += 1 }
          else if (c == ')') { depth -= 1; if (depth > 0) out.write(c); j += 1 }
          else { out.write(c); j += 1 }
        }
        Some(out.toByteArray)
      case _ => None
    }
  }

  // -------------------------------------------------- fixture-side encryptor

  /** Wrap a clear scan-shaped PDF (the CorpusGen/q19 frame grammar) in
    * standard security with EMPTY user and owner passwords: RC4 every
    * stream, append the /Encrypt object and a trailer carrying it plus a
    * deterministic /ID. `corruptU` flips a /U byte so the empty password no
    * longer verifies (the genuinely-password-protected fixture). Fixtures
    * only; the pipeline never encrypts. */
  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString

  private def detBytes(seed: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => (graft.text.TextHash.mix64(seed + i) & 0xff).toByte)

  /** Fixture-side AES encryption: V4/R4 (AESV2 crypt filter, 128-bit RC4-era
    * key schedule) or V5/R6 (AESV3, SHA-2 + AES-256). Streams grow (IV +
    * CMS padding), so this SPLICES: each frame's /Length is rewritten to
    * the stored ciphertext size — exactly what a real encrypting writer
    * does. Deterministic IVs/salts from `idSeed`. Fixtures only. */
  def encryptAes(clear: Array[Byte], v: Int = 4, idSeed: Long = 42L,
                 corruptU: Boolean = false): Array[Byte] = {
    require(v == 4 || v == 5)
    val p = -4
    val id0 = detBytes(idSeed, 16)
    // build the Encrypt dict pieces + the content key
    val (encDictBody, contentKey, perObject) =
      if (v == 4) {
        var od = md5(Pad)
        var i = 0
        while (i < 50) { od = md5(od); i += 1 }
        val oKey = od.take(16)
        var o = rc4(oKey, Pad)
        i = 1
        while (i <= 19) { o = rc4(oKey.map(b => (b ^ i).toByte), o); i += 1 }
        val key = fileKey(StdCrypt(4, 4, 128, o, Array.emptyByteArray, p, id0))
        var u = rc4(key, md5(Pad, id0))
        i = 1
        while (i <= 19) { u = rc4(key.map(b => (b ^ i).toByte), u); i += 1 }
        var u32 = u ++ new Array[Byte](16)
        if (corruptU) u32 = u32.updated(0, (u32(0) ^ 0x55).toByte)
        (s"<< /Filter /Standard /V 4 /R 4 /Length 128 " +
          s"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF " +
          s"/O <${hex(o)}> /U <${hex(u32)}> /P $p >>", key, true)
      } else {
        val fk = detBytes(idSeed ^ 0x5ca1ab1eL, 32)
        val vSalt = detBytes(idSeed + 101, 8)
        val kSalt = detBytes(idSeed + 202, 8)
        val oV = detBytes(idSeed + 303, 8)
        val oK = detBytes(idSeed + 404, 8)
        var uHash = hash2B(Array.emptyByteArray, vSalt, Array.emptyByteArray)
        if (corruptU) uHash = uHash.updated(0, (uHash(0) ^ 0x55).toByte)
        val u48 = uHash ++ vSalt ++ kSalt
        val ue = aesCbcRaw(hash2B(Array.emptyByteArray, kSalt, Array.emptyByteArray),
          new Array[Byte](16), fk, encrypt = true)
        val oHash = hash2B(Array.emptyByteArray, oV, u48)
        val o48 = oHash ++ oV ++ oK
        val oe = aesCbcRaw(hash2B(Array.emptyByteArray, oK, u48),
          new Array[Byte](16), fk, encrypt = true)
        (s"<< /Filter /Standard /V 5 /R 6 /Length 256 " +
          s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
          s"/O <${hex(o48)}> /OE <${hex(oe)}> /U <${hex(u48)}> /UE <${hex(ue)}> /P $p >>",
          fk, false)
      }
    def encPayload(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val key = if (perObject) objectKeyAes(contentKey, num, gen) else contentKey
      val iv = detBytes(idSeed * 31 + num * 7L + gen, 16)
      val padLen = 16 - (data.length % 16)
      val padded = data ++ Array.fill(padLen)(padLen.toByte)
      iv ++ aesCbcRaw(key, iv, padded, encrypt = true)
    }
    // splice: copy everything, replacing stream payloads and their /Length
    val s = latin1(clear, 0, clear.length)
    val out = new java.io.ByteArrayOutputStream(clear.length + 1024)
    var copied = 0
    var maxNum = 0
    walkFramesWithDict(s) { (num, gen, dictStart, stStart, ps, pe) =>
      maxNum = math.max(maxNum, num)
      if (pe > ps) {
        out.write(clear, copied, dictStart - copied)
        val payload = encPayload(num, gen,
          java.util.Arrays.copyOfRange(clear, ps, pe))
        val dictText = s.substring(dictStart, stStart)
        val newDict = """/Length\s+\d+""".r
          .replaceFirstIn(dictText, "/Length " + payload.length)
        out.write(newDict.getBytes(StandardCharsets.ISO_8859_1))
        out.write(clear, stStart, ps - stStart) // the "stream" keyword + EOL
        out.write(payload, 0, payload.length)
        copied = pe
      }
    }
    out.write(clear, copied, clear.length - copied)
    val eNum = maxNum + 1
    val tail =
      s"""$eNum 0 obj
         |$encDictBody
         |endobj
         |trailer
         |<< /Root 1 0 R /Encrypt $eNum 0 R /ID [<${hex(id0)}> <${hex(id0)}>] >>
         |%%EOF
         |""".stripMargin.getBytes(StandardCharsets.US_ASCII)
    out.write(tail, 0, tail.length)
    out.toByteArray
  }

  /** walkFrames variant exposing the dict span (for the splicing encryptor):
    * f(num, gen, dictStart, streamKeywordStart, payloadStart, payloadEnd) —
    * called only for frames WITH a stream. */
  private def walkFramesWithDict(s: String)(f: (Int, Int, Int, Int, Int, Int) => Unit): Unit = {
    val objRe = """(\d+)\s+(\d+)\s+obj""".r
    var pos = 0
    while (pos < s.length) {
      objRe.findFirstMatchIn(s.substring(pos, math.min(s.length, pos + (1 << 20)))) match {
        case None =>
          if (pos + (1 << 20) >= s.length) return
          pos += (1 << 20) - 32
        case Some(m0) =>
          val mEnd = pos + m0.end
          val num = m0.group(1).toInt
          val gen = m0.group(2).toInt
          val stRel = s.indexOf("stream", mEnd)
          val endRel = s.indexOf("endobj", mEnd)
          if (endRel >= 0 && (stRel < 0 || endRel < stRel)) pos = endRel + "endobj".length
          else if (stRel >= 0) {
            var ps = stRel + "stream".length
            if (ps < s.length && s.charAt(ps) == '\r') ps += 1
            if (ps < s.length && s.charAt(ps) == '\n') ps += 1
            val dictText = s.substring(mEnd, stRel)
            val lenM = """/Length\s+(\d+)(?!\s*\d+\s+R)""".r.findFirstMatchIn(dictText)
            val pe = lenM match {
              case Some(lm) => math.min(ps + lm.group(1).toLong, s.length.toLong).toInt
              case None =>
                val es = s.indexOf("endstream", ps)
                if (es < 0) s.length
                else {
                  var e = es
                  if (e > ps && s.charAt(e - 1) == '\n') e -= 1
                  if (e > ps && s.charAt(e - 1) == '\r') e -= 1
                  e
                }
            }
            f(num, gen, mEnd, stRel, ps, pe)
            val eo = s.indexOf("endobj", pe)
            pos = if (eo < 0) pe else eo + "endobj".length
          } else return
      }
    }
  }

  def encryptRc4(clear: Array[Byte], v: Int = 2, lengthBits: Int = 128,
                 p: Int = -4, idSeed: Long = 42L,
                 corruptU: Boolean = false): Array[Byte] = {
    require(v == 1 || v == 2)
    val r = if (v == 1) 2 else 3
    val bits = if (v == 1) 40 else lengthBits
    val n = bits / 8
    val id0 = Array.tabulate(16)(i =>
      (graft.text.TextHash.mix64(idSeed + i) & 0xff).toByte)
    // Algorithm 3: /O for empty owner+user passwords
    var od = md5(Pad)
    if (r >= 3) { var i = 0; while (i < 50) { od = md5(od); i += 1 } }
    val oKey = od.take(n)
    var o = rc4(oKey, Pad)
    if (r >= 3) {
      var i = 1
      while (i <= 19) { o = rc4(oKey.map(b => (b ^ i).toByte), o); i += 1 }
    }
    val crypt0 = StdCrypt(v, r, bits, o, Array.emptyByteArray, p, id0)
    val key = fileKey(crypt0)
    // Algorithms 4/5: /U
    var u =
      if (r == 2) rc4(key, Pad)
      else {
        var h = rc4(key, md5(Pad, id0))
        var i = 1
        while (i <= 19) { h = rc4(key.map(b => (b ^ i).toByte), h); i += 1 }
        h ++ new Array[Byte](16)
      }
    if (corruptU) u = u.updated(0, (u(0) ^ 0x55).toByte)
    // RC4 every stream payload in place (the same payload-skipping walk the
    // decrypt side uses — encrypt/decrypt stay structurally symmetric)
    val s = latin1(clear, 0, clear.length)
    val out = clear.clone()
    var maxNum = 0
    walkFrames(s) { (num, gen, _, ps, pe) =>
      maxNum = math.max(maxNum, num)
      if (pe > ps) {
        val encd = rc4(objectKey(key, num, gen),
          java.util.Arrays.copyOfRange(clear, ps, pe))
        System.arraycopy(encd, 0, out, ps, encd.length)
      }
    }
    val eNum = maxNum + 1
    val tail =
      s"""$eNum 0 obj
         |<< /Filter /Standard /V $v /R $r /Length $bits /O <${hex(o)}> /U <${hex(u)}> /P $p >>
         |endobj
         |trailer
         |<< /Root 1 0 R /Encrypt $eNum 0 R /ID [<${hex(id0)}> <${hex(id0)}>] >>
         |%%EOF
         |""".stripMargin.getBytes(StandardCharsets.US_ASCII)
    out ++ tail
  }
}
