package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mbox

class MboxSpec extends AnyFunSuite {

  private def mbox(messages: String*): Array[Byte] =
    messages.map(m => "From alice@example.com Thu Jan  1 00:00:00 2026\n" + m)
      .mkString("\n").getBytes("ISO-8859-1")

  test("plain single-part message: headers unfold, body passes through") {
    val m = mbox(
      """From: Alice <alice@example.com>
        |Subject: hello
        | world
        |Date: Thu, 1 Jan 2026 00:00:00 +0000
        |
        |line one
        |line two""".stripMargin)
    val got = Mbox.messages(m).get
    assert(got.length === 1)
    assert(got.head.subject === "hello world") // folded header unwrapped
    assert(got.head.text === "line one\nline two")
    assert(got.head.nParts === 1)
  }

  test("multiple messages split on postmarks; From-stuffing reverses one level") {
    val m = mbox(
      "From: a@x\nSubject: one\n\n>From the start\n>>From deeper\n",
      "From: b@x\nSubject: two\n\nbody two")
    val got = Mbox.messages(m).get
    assert(got.length === 2)
    assert(got(0).text === "From the start\n>From deeper")
    assert(got(1).subject === "two")
  }

  test("RFC 2047 encoded words: B and Q forms, charset honored, adjacent words join") {
    assert(Mbox.decode2047("=?UTF-8?B?UsOpc3Vtw6k=?= time") === "Résumé time")
    assert(Mbox.decode2047("=?ISO-8859-1?Q?caf=E9_au_lait?=") === "café au lait")
    // adjacent encoded words: the whitespace between them is dropped
    assert(Mbox.decode2047("=?UTF-8?B?YWI=?= =?UTF-8?B?Y2Q=?=") === "abcd")
    // non-adjacent text keeps its spacing
    assert(Mbox.decode2047("x =?UTF-8?Q?y?= z") === "x y z")
  }

  test("quoted-printable: escapes, soft breaks; malformed escapes reject the message") {
    val m = mbox(
      """From: a@x
        |Content-Type: text/plain; charset=utf-8
        |Content-Transfer-Encoding: quoted-printable
        |
        |a=3Db and caf=C3=A9 wrap=
        |ped""".stripMargin)
    assert(Mbox.messages(m).get.head.text === "a=b and café wrapped")
    val bad = mbox(
      "From: a@x\nContent-Transfer-Encoding: quoted-printable\n\nbad =ZZ escape")
    assert(Mbox.messages(bad) === None)
  }

  test("base64 bodies decode strictly: garbage inside rejects, padding enforced") {
    val payload = "base sixty four body"
    val m = mbox(
      s"""From: a@x
         |Content-Type: text/plain; charset=utf-8
         |Content-Transfer-Encoding: base64
         |
         |${Mbox.b64Encode(payload)}""".stripMargin)
    assert(Mbox.messages(m).get.head.text === payload)
    val evil = new String(m, "ISO-8859-1").replaceFirst("\n\n", "\n\n*")
    assert(Mbox.messages(evil.getBytes("ISO-8859-1")) === None)
  }

  test("multipart: parts split on exact boundary lines, preamble/epilogue discarded, nesting works") {
    val m = mbox(
      """From: a@x
        |Content-Type: multipart/mixed; boundary="outer"
        |
        |preamble is discarded
        |--outer
        |Content-Type: text/plain; charset=us-ascii
        |
        |part one
        |--outer
        |Content-Type: multipart/alternative; boundary=inner
        |
        |--inner
        |Content-Type: text/plain
        |
        |nested text
        |--inner
        |Content-Type: text/html
        |
        |<p>ignored html</p>
        |--inner--
        |--outer
        |Content-Type: application/octet-stream
        |Content-Transfer-Encoding: base64
        |
        |AAECAw==
        |--outer--
        |epilogue is discarded""".stripMargin)
    val got = Mbox.messages(m).get.head
    assert(got.nParts === 4) // two text/plain + html + binary
    assert(got.text === "part one\nnested text")
  }

  test("framing rejects: no postmark, missing From header, headerless colon, unterminated multipart, unknown CTE") {
    assert(Mbox.messages("To: x\n\nbody".getBytes("ISO-8859-1")) === None)
    assert(Mbox.messages(mbox("Subject: s\n\nbody")) === None) // no From header
    assert(Mbox.messages(mbox("NoColonLine\n\nbody")) === None)
    assert(Mbox.messages(mbox(
      "From: a@x\nContent-Type: multipart/mixed; boundary=b\n\n--b\n\nx")) === None)
    assert(Mbox.messages(mbox(
      "From: a@x\nContent-Transfer-Encoding: uuencode\n\nx")) === None)
    assert(Mbox.messages(null) === None)
    assert(Mbox.messages(Array[Byte]()) === None)
  }
}
