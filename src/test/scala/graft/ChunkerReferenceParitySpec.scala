package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunker
import graft.operators.Chunker._

/** The reference's own chunker test cases, re-asserted against our
  * implementation (reference: apps/backend/internal/text/
  * chunker_test.go — TestChunkMarkdown, TestChunkProse,
  * TestDetectChunkType, TestChunkCode, TestIsNoiseChunk,
  * TestCleanMarkdownNoise, TestChunkMarkdown_NoiseFiltering).
  * Pure string logic, no Spark session needed.
  *
  * One deliberate deviation: the reference's word-split fallback
  * appends an EMPTY chunk when the first word of a line already
  * exceeds the budget (chunker.go:283 has no emptiness check); we
  * skip empties — the reference's own noise filter discards them one
  * stage later, so ChunkMarkdown outputs are identical. */
class ChunkerReferenceParitySpec extends AnyFunSuite {

  // --- TestChunkMarkdown -------------------------------------------------
  test("basic prose: one chunk, content preserved, type prose") {
    val text = "This is a simple paragraph."
    val chunks = chunkMarkdown(text, 100, 0)
    assert(chunks.length == 1)
    assert(chunks.head.content == text)
    assert(chunks.head.chunkType == TypeProse)
  }

  test("code block: fenced go content preserved; short labels filtered") {
    val text = "Here is some code:\n```go\nfunc main() {}\n```\nEnd."
    val chunks = chunkMarkdown(text, 100, 0)
    assert(chunks.nonEmpty)
    val code = chunks.find(_.chunkType == TypeCode)
    assert(code.isDefined)
    assert(code.get.content == "```go\nfunc main() {}\n```")
    assert(code.get.language == "go")
  }

  test("code block types: json/bash/openapi/python classification") {
    val cases = Seq("json" -> TypeConfig, "bash" -> TypeCmd,
                    "openapi" -> TypeApi, "python" -> TypeCode)
    for ((lang, want) <- cases) {
      val chunks = chunkMarkdown(s"```$lang\ncontent\n```", 100, 0)
      assert(chunks.length == 1, s"lang=$lang")
      assert(chunks.head.chunkType == want, s"lang=$lang")
    }
  }

  test("large code block splits, first piece keeps the fence") {
    val content = ("1234567890\n" * 10)
    val text = "```txt\n" + content + "```"
    val chunks = chunkMarkdown(text, 10, 0)
    assert(chunks.length > 1)
    assert(chunks.head.content.contains("```txt"))
  }

  // --- TestChunkProse ----------------------------------------------------
  test("headers split prose into per-section chunks") {
    val chunks = chunkProse("# Header 1\nContent 1\n## Header 2\nContent 2", 100, 0)
    assert(chunks.length == 2)
    assert(chunks(0).content.contains("Header 1"))
    assert(chunks(1).content.contains("Header 2"))
  }

  test("paragraph split at tiny budget yields exactly three chunks") {
    val text = "Short paragraph.\n\nAnother short paragraph."
    val chunks = chunkProse(text, 5, 0)
    assert(chunks.length == 3)
  }

  test("line split on oversized paragraphs") {
    val chunks = chunkProse("Line 1 is long enough.\nLine 2 is also long.", 5, 0)
    assert(chunks.length >= 2)
  }

  test("word split fallback on oversized lines") {
    val chunks = chunkProse("VeryLongWordThatExceedsLimit AnotherWord", 2, 0)
    assert(chunks.length >= 2)
  }

  // --- TestDetectChunkType -----------------------------------------------
  test("chunk type detection heuristics") {
    val cases = Seq(
      "Swagger API Definition" -> TypeApi,
      "This is an OpenAPI spec" -> TypeApi,
      "API Endpoint URL Method" -> TypeApi,
      "Endpoint Method HTTP request" -> TypeApi,
      "Just some text" -> TypeProse,
      "func main() { fmt.Println() }" -> TypeProse,
      "" -> TypeProse,
      "this swagger spec defines" -> TypeApi,
      "OPENAPI 3.0 Specification" -> TypeApi,
      "The endpoint is fast" -> TypeProse)
    for ((content, want) <- cases)
      assert(detectChunkType(content) == want, s"content=$content")
  }

  // --- TestChunkCode -----------------------------------------------------
  test("small code block fits in one re-fenced chunk") {
    val chunks = chunkCode("line1\nline2\nline3", "go", TypeCode, 100)
    assert(chunks.length == 1)
    assert(chunks.head.content.contains("```go"))
    assert(chunks.head.content.contains("line1") && chunks.head.content.contains("line3"))
    assert(chunks.head.chunkType == TypeCode && chunks.head.language == "go")
  }

  test("large code block splits by line, every piece re-fenced and typed") {
    val content = Seq.fill(10)("1234567890").mkString("\n")
    val chunks = chunkCode(content, "python", TypeCode, 10)
    assert(chunks.length > 1)
    chunks.foreach { c =>
      assert(c.content.contains("```python"))
      assert(c.chunkType == TypeCode && c.language == "python")
    }
  }

  test("empty content still yields one fenced chunk") {
    val chunks = chunkCode("", "go", TypeCode, 100)
    assert(chunks.length == 1)
    assert(chunks.head.content.contains("```go"))
  }

  test("cmd and config types survive code splitting") {
    val cmd = chunkCode("curl http://api.example.com", "bash", TypeCmd, 100)
    assert(cmd.length == 1 && cmd.head.chunkType == TypeCmd && cmd.head.language == "bash")
    val cfg = chunkCode("key: value\nanother: setting", "yaml", TypeConfig, 100)
    assert(cfg.length == 1 && cfg.head.chunkType == TypeConfig)
  }

  // --- TestIsNoiseChunk --------------------------------------------------
  test("noise: empty, install commands, nav links, labels, legal") {
    assert(isNoiseChunk(""))
    assert(isNoiseChunk("   "))
    assert(isNoiseChunk("npm install shadcn-vue"))
    assert(isNoiseChunk("pnpm add @tanstack/vue-query"))
    assert(isNoiseChunk("yarn add react"))
    assert(isNoiseChunk("pip install django"))
    assert(isNoiseChunk("cargo add serde"))
    assert(isNoiseChunk("go get github.com/gin-gonic/gin"))
    assert(isNoiseChunk("[Home](/)\n[About](/about)\n[Docs](/docs)\n[API](/api)\n[Blog](/blog)"))
    assert(isNoiseChunk("Overview"))
    assert(isNoiseChunk("Getting Started"))
    assert(isNoiseChunk("# API"))
    assert(isNoiseChunk("© 2024 Example Corp. All rights reserved."))
    assert(isNoiseChunk("Terms of Service | Privacy Policy"))
  }

  test("not noise: explained installs, prose with links, code, real docs") {
    assert(!isNoiseChunk(
      "To get started with React Query, install the package:\n\n" +
      "npm install @tanstack/react-query\n\nThen wrap your app in the QueryClientProvider."))
    assert(!isNoiseChunk(
      "## Related Resources\n\nFor more information on routing, see the " +
      "[Vue Router docs](https://router.vuejs.org).\n\nThe middleware pattern " +
      "is explained in [Express guide](https://expressjs.com)."))
    assert(!isNoiseChunk("```go\nfmt.Println()\n```"))
    assert(!isNoiseChunk(
      "## useQuery Hook\n\nThe useQuery hook is the primary way to fetch data " +
      "in React Query. It accepts a query key and a query function."))
    assert(!isNoiseChunk(
      "Import the createApp function from Vue and mount your application to the DOM element."))
  }

  // --- TestCleanMarkdownNoise ---------------------------------------------
  test("clean: strips edit links and ToC, preserves real content verbatim") {
    val withEdit = "Some content\n[Edit this page](https://github.com/edit)\nMore content"
    val r1 = cleanMarkdownNoise(withEdit)
    assert(!r1.contains("Edit this page"))
    assert(r1.contains("Some content") && r1.contains("More content"))

    val withToc = "## Table of Contents\n- [Section 1](#section-1)\n- [Section 2](#section-2)\n\n## Section 1\nReal content here"
    val r2 = cleanMarkdownNoise(withToc)
    assert(!r2.contains("Table of Contents"))
    assert(r2.contains("Section 1") && r2.contains("Real content here"))

    val clean = "# API Reference\n\nThe `createApp` function initializes a new Vue application instance."
    assert(cleanMarkdownNoise(clean) == clean)
  }

  // --- TestChunkMarkdown_NoiseFiltering ------------------------------------
  test("install-only chunks filtered; fenced install commands preserved") {
    val text1 = "# Getting Started\n\nThis is a guide.\n\nnpm install my-package\n\n" +
      "## Next Steps\n\nConfigure your application by editing the config file."
    assert(chunkMarkdown(text1, 100, 0)
      .forall(_.content.trim != "npm install my-package"))

    val text2 = "Install the package:\n```bash\nnpm install my-package\n```\nThen configure it."
    assert(chunkMarkdown(text2, 100, 0).exists(_.chunkType == TypeCmd))
  }
}
