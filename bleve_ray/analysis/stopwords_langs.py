"""Snowball stop-word lists for de/fr/es/it/pt (public, BSD-licensed;
from svn.tartarus.org/snowball stop.txt files).  The same sets the
reference loads in analysis/lang/{de,fr,es,it,pt}/stop_words_*.go."""

DE_STOP_WORDS = frozenset(
    """
aber alle allem allen aller alles als also
am an ander andere anderem anderen anderer anderes
anderm andern anderr anders auch auf aus bei
bin bis bist da damit dann das dasselbe
dazu daß dein deine deinem deinen deiner deines
dem demselben den denn denselben der derer derselbe
derselben des desselben dessen dich die dies diese
dieselbe dieselben diesem diesen dieser dieses dir doch
dort du durch ein eine einem einen einer
eines einig einige einigem einigen einiger einiges einmal
er es etwas euch euer eure eurem euren
eurer eures für gegen gewesen hab habe haben
hat hatte hatten hier hin hinter ich ihm
ihn ihnen ihr ihre ihrem ihren ihrer ihres
im in indem ins ist jede jedem jeden
jeder jedes jene jenem jenen jener jenes jetzt
kann kein keine keinem keinen keiner keines können
könnte machen man manche manchem manchen mancher manches
mein meine meinem meinen meiner meines mich mir
mit muss musste nach nicht nichts noch nun
nur ob oder ohne sehr sein seine seinem
seinen seiner seines selbst sich sie sind so
solche solchem solchen solcher solches soll sollte sondern
sonst um und uns unse unsem unsen unser
unses unter viel vom von vor war waren
warst was weg weil weiter welche welchem welchen
welcher welches wenn werde werden wie wieder will
wir wird wirst wo wollen wollte während würde
würden zu zum zur zwar zwischen über
""".split()
)

FR_STOP_WORDS = frozenset(
    """
ai aie aient aies ait as au aura
aurai auraient aurais aurait auras aurez auriez aurions
aurons auront aux avaient avais avait avec avez
aviez avions avons ayant ayez ayons c ce
ceci cela celà ces cet cette d dans
de des du elle en es est et
eu eue eues eurent eus eusse eussent eusses
eussiez eussions eut eux eûmes eût eûtes furent
fus fusse fussent fusses fussiez fussions fut fûmes
fût fûtes ici il ils j je l
la le les leur leurs lui m ma
mais me mes moi mon même n ne
nos notre nous on ont ou par pas
pour qu que quel quelle quelles quels qui
s sa sans se sera serai seraient serais
serait seras serez seriez serions serons seront ses
soi soient sois soit sommes son sont soyez
soyons suis sur t ta te tes toi
ton tu un une vos votre vous y
à étaient étais était étant étiez étions été
étée étées étés êtes
""".split()
)

ES_STOP_WORDS = frozenset(
    """
a al algo algunas algunos ante antes como
con contra cual cuando de del desde donde
durante e el ella ellas ellos en entre
era erais eran eras eres es esa esas
ese eso esos esta estaba estabais estaban estabas
estad estada estadas estado estados estamos estando estar
estaremos estará estarán estarás estaré estaréis estaría estaríais
estaríamos estarían estarías estas este estemos esto estos
estoy estuve estuviera estuvierais estuvieran estuvieras estuvieron estuviese
estuvieseis estuviesen estuvieses estuvimos estuviste estuvisteis estuviéramos estuviésemos
estuvo está estábamos estáis están estás esté estéis
estén estés fue fuera fuerais fueran fueras fueron
fuese fueseis fuesen fueses fui fuimos fuiste fuisteis
fuéramos fuésemos ha habida habidas habido habidos habiendo
habremos habrá habrán habrás habré habréis habría habríais
habríamos habrían habrías habéis había habíais habíamos habían
habías han has hasta hay haya hayamos hayan
hayas hayáis he hemos hube hubiera hubierais hubieran
hubieras hubieron hubiese hubieseis hubiesen hubieses hubimos hubiste
hubisteis hubiéramos hubiésemos hubo la las le les
lo los me mi mis mucho muchos muy
más mí mía mías mío míos nada ni
no nos nosotras nosotros nuestra nuestras nuestro nuestros
o os otra otras otro otros para pero
poco por porque que quien quienes qué se
sea seamos sean seas seremos será serán serás
seré seréis sería seríais seríamos serían serías seáis
sido siendo sin sobre sois somos son soy
su sus suya suyas suyo suyos sí también
tanto te tendremos tendrá tendrán tendrás tendré tendréis
tendría tendríais tendríamos tendrían tendrías tened tenemos tenga
tengamos tengan tengas tengo tengáis tenida tenidas tenido
tenidos teniendo tenéis tenía teníais teníamos tenían tenías
ti tiene tienen tienes todo todos tu tus
tuve tuviera tuvierais tuvieran tuvieras tuvieron tuviese tuvieseis
tuviesen tuvieses tuvimos tuviste tuvisteis tuviéramos tuviésemos tuvo
tuya tuyas tuyo tuyos tú un una uno
unos vosotras vosotros vuestra vuestras vuestro vuestros y
ya yo él éramos
""".split()
)

IT_STOP_WORDS = frozenset(
    """
a abbia abbiamo abbiano abbiate ad agl agli
ai al all alla alle allo anche avemmo
avendo avesse avessero avessi avessimo aveste avesti avete
aveva avevamo avevano avevate avevi avevo avrai avranno
avrebbe avrebbero avrei avremmo avremo avreste avresti avrete
avrà avrò avuta avute avuti avuto c che
chi ci coi col come con contro cui
da dagl dagli dai dal dall dalla dalle
dallo degl degli dei del dell della delle
dello di dov dove e ebbe ebbero ebbi
ed era erano eravamo eravate eri ero essendo
faccia facciamo facciano facciate faccio facemmo facendo facesse
facessero facessi facessimo faceste facesti faceva facevamo facevano
facevate facevi facevo fai fanno farai faranno farebbe
farebbero farei faremmo faremo fareste faresti farete farà
farò fece fecero feci fosse fossero fossi fossimo
foste fosti fu fui fummo furono gli ha
hai hanno ho i il in io l
la le lei li lo loro lui ma
mi mia mie miei mio ne negl negli
nei nel nell nella nelle nello noi non
nostra nostre nostri nostro o per perché più
quale quanta quante quanti quanto quella quelle quelli
quello questa queste questi questo sarai saranno sarebbe
sarebbero sarei saremmo saremo sareste saresti sarete sarà
sarò se sei si sia siamo siano siate
siete sono sta stai stando stanno starai staranno
starebbe starebbero starei staremmo staremo stareste staresti starete
starà starò stava stavamo stavano stavate stavi stavo
stemmo stesse stessero stessi stessimo steste stesti stette
stettero stetti stia stiamo stiano stiate sto su
sua sue sugl sugli sui sul sull sulla
sulle sullo suo suoi ti tra tu tua
tue tuo tuoi tutti tutto un una uno
vi voi vostra vostre vostri vostro è
""".split()
)

PT_STOP_WORDS = frozenset(
    """
a ao aos aquela aquelas aquele aqueles aquilo
as até com como da das de dela
delas dele deles depois do dos e ela
elas ele eles em entre era eram essa
essas esse esses esta estamos estas estava estavam
este esteja estejam estejamos estes esteve estive estivemos
estiver estivera estiveram estiverem estivermos estivesse estivessem estivéramos
estivéssemos estou está estávamos estão eu foi fomos
for fora foram forem formos fosse fossem fui
fôramos fôssemos haja hajam hajamos havemos hei houve
houvemos houver houvera houveram houverei houverem houveremos houveria
houveriam houvermos houverá houverão houveríamos houvesse houvessem houvéramos
houvéssemos há hão isso isto já lhe lhes
mais mas me mesmo meu meus minha minhas
muito na nas nem no nos nossa nossas
nosso nossos num numa não nós o os
ou para pela pelas pelo pelos por qual
quando que quem se seja sejam sejamos sem
serei seremos seria seriam será serão seríamos seu
seus somos sou sua suas são só também
te tem temos tenha tenham tenhamos tenho terei
teremos teria teriam terá terão teríamos teu teus
teve tinha tinham tive tivemos tiver tivera tiveram
tiverem tivermos tivesse tivessem tivéramos tivéssemos tu tua
tuas tém tínhamos um uma você vocês vos
à às éramos
""".split()
)



# Arabic stop words (Savoy BSD list, the same data the reference embeds in
# analysis/lang/ar/stop_words_ar.go)
AR_STOP_WORDS = frozenset(
    """
من ومن منها منه في وفي فيها فيه
و ف ثم او أو ب بها به
ا أ اى اي أي أى لا ولا
الا ألا إلا لكن ما وما كما فما
عن مع اذا إذا ان أن إن انها
أنها إنها انه أنه إنه بان بأن فان
فأن وان وأن وإن التى التي الذى الذي
الذين الى الي إلى إلي على عليها عليه
اما أما إما ايضا أيضا كل وكل لم
ولم لن ولن هى هي هو وهى وهي
وهو فهى فهي فهو انت أنت لك لها
له هذه هذا تلك ذلك هناك كانت كان
يكون تكون وكانت وكان غير بعض قد نحو
بين بينما منذ ضمن حيث الان الآن خلال
بعد قبل حتى عند عندما لدى جميع
""".split()
)

# Russian stop words (snowball stop.txt, reference stop_words_ru.go)
RU_STOP_WORDS = frozenset(
    """
и в во не что он на я
с со как а то все она так
его но да ты к у же вы
за бы по только ее мне было вот
от меня еще нет о из ему теперь
когда даже ну вдруг ли если уже или
ни быть был него до вас нибудь опять
уж вам сказал ведь там потом себя ничего
ей может они тут где есть надо ней
для мы тебя их чем была сам чтоб
без будто человек чего раз тоже себе под
жизнь будет ж тогда кто этот говорил того
потому этого какой совсем ним здесь этом один
почти мой тем чтобы нее кажется сейчас были
куда зачем сказать всех никогда сегодня можно при
наконец два об другой хоть после над больше
тот через эти нас про всего них какая
много разве сказала три эту моя впрочем хорошо
свою этой перед иногда лучше чуть том нельзя
такой им более всегда конечно всю между
""".split()
)


# Persian stop words (reference stop_words_fa.go; public BSD lists)
FA_STOP_WORDS = frozenset(
    """
انان نداشته سراسر خياه ايشان وي تاكنون بيشتري
دوم پس ناشي وگو يا داشتند سپس هنگام
هرگز پنج نشان امسال ديگر گروهي شدند چطور
ده و دو نخستين ولي چرا چه وسط
ه كدام قابل يك رفت هفت همچنين در
هزار بله بلي شايد اما شناسي گرفته دهد
داشته دانست داشتن خواهيم ميليارد وقتيكه امد خواهد
جز اورده شده بلكه خدمات شدن برخي نبود
بسياري جلوگيري حق كردند نوعي بعري نكرده نظير
نبايد بوده بودن داد اورد هست جايي شود
دنبال داده بايد سابق هيچ همان انجا كمتر
كجاست گردد كسي تر مردم تان دادن بودند
سري جدا ندارند مگر يكديگر دارد دهند بنابراين
هنگامي سمت جا انچه خود دادند زياد دارند
اثر بدون بهترين بيشتر البته به براساس بيرون
كرد بعضي گرفت توي اي ميليون او جريان
تول بر مانند برابر باشيم مدتي گويند اكنون
تا تنها جديد چند بي نشده كردن كردم
گويد كرده كنيم نمي نزد روي قصد فقط
بالاي ديگران اين ديروز توسط سوم ايم دانند
سوي استفاده شما كنار داريم ساخته طور امده
رفته نخست بيست نزديك طي كنيد از انها
تمامي داشت يكي طريق اش چيست روب نمايد
گفت چندين چيزي تواند ام ايا با ان
ايد ترين اينكه ديگري راه هايي بروز همچنان
پاعين كس حدود مختلف مقابل چيز گيرد ندارد
ضد همچون سازي شان مورد باره مرسي خويش
برخوردار چون خارج شش هنوز تحت ضمن هستيم
گفته فكر بسيار پيش براي روزهاي انكه نخواهد
بالا كل وقتي كي چنين كه گيري نيست
است كجا كند نيز يابد بندي حتي توانند
عقب خواست كنند بين تمام همه ما باشند
مثل شد اري باشد اره طبق بعد اگر
صورت غير جاي بيش ريزي اند زيرا چگونه
بار لطفا مي درباره من ديده همين گذاري
برداري علت گذاشته هم فوق نه ها شوند
اباد همواره هر اول خواهند چهار نام امروز
مان هاي قبل كنم سعي تازه را هستند
زير جلوي عنوان بود
""".split()
)


# Swedish (snowball) stop words (reference stop_words_sv.go; public BSD lists)
SV_STOP_WORDS = frozenset(
    """
och det att i en jag hon som
han på den med var sig för så
till är men ett om hade de av
icke mig du henne då sin nu har
inte hans honom skulle hennes där min man
ej vid kunde något från ut när efter
upp vi dem vara vad över än dig
kan sina här ha mot alla under någon
eller allt mycket sedan ju denna själv detta
åt utan varit hur ingen mitt ni bli
blev oss din dessa några deras blir mina
samma vilken er sådan vår blivit dess inom
mellan sådant varför varje vilka ditt vem vilket
sitta sådana vart dina vars vårt våra ert
era vilkas
""".split()
)


# Norwegian (snowball) stop words (reference stop_words_no.go; public BSD lists)
NO_STOP_WORDS = frozenset(
    """
og i jeg det at en et den
til er som på de med han av
ikke ikkje der så var meg seg men
ett har om vi min mitt ha hadde
hun nå over da ved fra du ut
sin dem oss opp man kan hans hvor
eller hva skal selv sjøl her alle vil
bli ble blei blitt kunne inn når være
kom noen noe ville dere som deres kun
ja etter ned skulle denne for deg si
sine sitt mot å meget hvorfor dette disse
uten hvordan ingen din ditt blir samme hvilken
hvilke sånn inni mellom vår hver hvem vors
hvis både bare enn fordi før mange også
slik vært være båe begge siden dykk dykkar
dei deira deires deim di då eg ein
eit eitt elles honom hjå ho hoe henne
hennar hennes hoss hossen ikkje ingi inkje korleis
korso kva kvar kvarhelst kven kvi kvifor me
medan mi mine mykje no nokon noka nokor
noko nokre si sia sidan so somt somme
um upp vere vore verte vort varte vart
""".split()
)


# Danish (snowball) stop words (reference stop_words_da.go; public BSD lists)
DA_STOP_WORDS = frozenset(
    """
og i jeg det at en den til
er som på de med han af for
ikke der var mig sig men et har
om vi min havde ham hun nu over
da fra du ud sin dem os op
man hans hvor eller hvad skal selv her
alle vil blev kunne ind når være dog
noget ville jo deres efter ned skulle denne
end dette mit også under have dig anden
hende mine alt meget sit sine vor mod
disse hvis din nogle hos blive mange ad
bliver hendes været thi jer sådan
""".split()
)


# Hindi (Lucene list) stop words (reference stop_words_hi.go; public BSD lists)
HI_STOP_WORDS = frozenset(
    """
अंदर अत अपना अपनी अपने अभी आदि आप
इत्यादि इन इनका इन्हीं इन्हें इन्हों इस इसका
इसकी इसके इसमें इसी इसे उन उनका उनकी
उनके उनको उन्हीं उन्हें उन्हों उस उसके उसी
उसे एक एवं एस ऐसे और कई कर
करता करते करना करने करें कहते कहा का
काफ़ी कि कितना किन्हें किन्हों किया किर किस
किसी किसे की कुछ कुल के को कोई
कौन कौनसा गया घर जब जहाँ जा जितना
जिन जिन्हें जिन्हों जिस जिसे जीधर जैसा जैसे
जो तक तब तरह तिन तिन्हें तिन्हों तिस
तिसे तो था थी थे दबारा दिया दुसरा
दूसरे दो द्वारा न नहीं ना निहायत नीचे
ने पर पर पहले पूरा पे फिर बनी
बही बहुत बाद बाला बिलकुल भी भीतर मगर
मानो मे में यदि यह यहाँ यही या
यिह ये रखें रहा रहे ऱ्वासा लिए लिये
लेकिन व वर्ग वह वह वहाँ वहीं वाले
वुह वे वग़ैरह संग सकता सकते सबसे सभी
साथ साबुत साभ सारा से सो ही हुआ
हुई हुए है हैं हो होता होती होते
होना होने अपनि जेसे होति सभि तिंहों इंहों
दवारा इसि किंहें थि उंहों ओर जिंहें वहिं
अभि बनि हि उंहिं उंहें हें वगेरह एसे
रवासा कोन निचे काफि उसि पुरा भितर हे
बहि वहां कोइ यहां जिंहों तिंहें किसि कइ
यहि इंहिं जिधर इंहें अदि इतयादि हुइ कोनसा
इसकि दुसरे जहां अप किंहों उनकि भि वरग
हुअ जेसा नहिं
""".split()
)


# Dutch stop words (snowball stop.txt, reference stop_words_nl.go)
NL_STOP_WORDS = frozenset(
    """
de en van ik te dat die in
een hij het niet zijn is was op
aan met als voor had er maar om
hem dan zou of wat mijn men dit
zo door over ze zich bij ook tot
je mij uit der daar haar naar heb
hoe heeft hebben deze u want nog zal
me zij nu ge geen omdat iets worden
toch al waren veel meer doen toen moet
ben zonder kan hun dus alles onder ja
eens hier wie werd altijd doch wordt wezen
kunnen ons zelf tegen na reeds wil kon
niets uw iemand geweest andere
""".split()
)


# Bulgarian stop words (reference stop_words_bg.go; public lists)
BG_STOP_WORDS = frozenset(
    """
а аз ако ала бе без беше би
бил била били било близо бъдат бъде бяха
в вас ваш ваша вероятно вече взема ви
вие винаги все всеки всички всичко всяка във
въпреки върху г ги главно го д да
дали до докато докога дори досега доста е
едва един ето за зад заедно заради засега
затова защо защото и из или им има
имат иска й каза как каква какво както
какъв като кога когато което които кой който
колко която къде където към ли м ме
между мен ми мнозина мога могат може моля
момента му н на над назад най направи
напред например нас не него нея ни ние
никой нито но някои някой няма обаче около
освен особено от отгоре отново още пак по
повече повечето под поне поради после почти прави
пред преди през при пък първо с са
само се сега си скоро след сме според
сред срещу сте съм със също т тази
така такива такъв там твой те тези ти
тн то това тогава този той толкова точно
трябва тук тъй тя тях у харесва ч
че често чрез ще щом я
""".split()
)


# Catalan stop words (reference stop_words_ca.go; public lists)
CA_STOP_WORDS = frozenset(
    """
a abans ací ah així això al als
aleshores algun alguna algunes alguns alhora allà allí
allò altra altre altres amb ambdós ambdues apa
aquell aquella aquelles aquells aquest aquesta aquestes aquests
aquí baix cada cadascú cadascuna cadascunes cadascuns com
contra d'un d'una d'unes d'uns dalt de del
dels des després dins dintre donat doncs durant
e eh el els em en encara ens
entre érem eren éreu es és esta està
estàvem estaven estàveu esteu et etc ets fins
fora gairebé ha han has havia he hem
heu hi ho i igual iguals ja l'hi
la les li li'n llavors m'he ma mal
malgrat mateix mateixa mateixes mateixos me mentre més
meu meus meva meves molt molta moltes molts
mon mons n'he n'hi ne ni no nogensmenys
només nosaltres nostra nostre nostres o oh oi
on pas pel pels per però perquè poc
poca pocs poques potser propi qual quals quan
quant que què quelcom qui quin quina quines
quins s'ha s'han sa semblant semblants ses seu
seus seva seva seves si sobre sobretot sóc
solament sols son són sons sota sou t'ha
t'han t'he ta tal també tampoc tan tant
tanta tantes teu teus teva teves ton tons
tot tota totes tots un una unes uns
us va vaig vam van vas veu vosaltres
vostra vostre vostres
""".split()
)


# Czech stop words (reference stop_words_cs.go; public lists)
CS_STOP_WORDS = frozenset(
    """
a s k o i u v z
dnes cz tímto budeš budem byli jseš můj
svým ta tomto tohle tuto tyto jej zda
proč máte tato kam tohoto kdo kteří mi
nám tom tomuto mít nic proto kterou byla
toho protože asi ho naši napište re což
tím takže svých její svými jste aj tu
tedy teto bylo kde ke pravé ji nad
nejsou či pod téma mezi přes ty pak
vám ani když však neg jsem tento článku
články aby jsme před pta jejich byl ještě
až bez také pouze první vaše která nás
nový tipy pokud může strana jeho své jiné
zprávy nové není vás jen podle zde už
být více bude již než který by které
co nebo ten tak má při od po
jsou jak další ale si se ve to
jako za zpět ze do pro je na
atd atp jakmile přičemž já on ona ono
oni ony my vy jí ji mě mne
jemu tomu těm těmu němu němuž jehož jíž
jelikož jež jakož načež
""".split()
)


# Greek stop words (reference stop_words_el.go; public lists)
EL_STOP_WORDS = frozenset(
    """
ο η το οι τα του τησ των
τον την και κι κ ειμαι εισαι ειναι
ειμαστε ειστε στο στον στη στην μα αλλα
απο για προσ με σε ωσ παρα αντι
κατα μετα θα να δε δεν μη μην
επι ενω εαν αν τοτε που πωσ ποιοσ
ποια ποιο ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη
αυτο αυτοι αυτων αυτουσ αυτεσ αυτα εκεινοσ εκεινη
εκεινο εκεινοι εκεινεσ εκεινα εκεινων εκεινουσ οπωσ ομωσ
ισωσ οσο οτι
""".split()
)


# Basque stop words (reference stop_words_eu.go; public lists)
EU_STOP_WORDS = frozenset(
    """
al anitz arabera asko baina bat batean batek
bati batzuei batzuek batzuetan batzuk bera beraiek berau
berauek bere berori beroriek beste bezala da dago
dira ditu du dute edo egin ere eta
eurak ez gainera gu gutxi guzti haiei haiek
haietan hainbeste hala han handik hango hara hari
hark hartan hau hauei hauek hauetan hemen hemendik
hemengo hi hona honek honela honetan honi hor
hori horiei horiek horietan horko horra horrek horrela
horretan horri hortik hura izan ni noiz nola
non nondik nongo nor nora ze zein zen
zenbait zenbat zer zergatik ziren zituen zu zuek
zuen zuten
""".split()
)


# Irish stop words (reference stop_words_ga.go; public lists)
GA_STOP_WORDS = frozenset(
    """
a ach ag agus an aon ar arna
as b' ba beirt bhúr caoga ceathair ceathrar
chomh chtó chuig chun cois céad cúig cúigear
d' daichead dar de deich deichniúr den dhá
do don dtí dá dár dó faoi faoin
faoina faoinár fara fiche gach gan go gur
haon hocht i iad idir in ina ins
inár is le leis lena lenár m' mar
mo mé na nach naoi naonúr ná ní
níor nó nócha ocht ochtar os roimh sa
seacht seachtar seachtó seasca seisear siad sibh sinn
sna sé sí tar thar thú triúr trí
trína trínár tríocha tú um ár é éis
í ó ón óna ónár
""".split()
)


# Galician stop words (reference stop_words_gl.go; public lists)
GL_STOP_WORDS = frozenset(
    """
a aínda alí aquel aquela aquelas aqueles aquilo
aquí ao aos as así á ben cando
che co coa comigo con connosco contigo convosco
coas cos cun cuns cunha cunhas da dalgunha
dalgunhas dalgún dalgúns das de del dela delas
deles desde deste do dos dun duns dunha
dunhas e el ela elas eles en era
eran esa esas ese eses esta estar estaba
está están este estes estiven estou eu é
facer foi foron fun había hai iso isto
la las lle lles lo los mais me
meu meus min miña miñas moi na nas
neste nin no non nos nosa nosas noso
nosos nós nun nunha nuns nunhas o os
ou ó ós para pero pode pois pola
polas polo polos por que se senón ser
seu seus sexa sido sobre súa súas tamén
tan te ten teñen teño ter teu teus
ti tido tiña tiven túa túas un unha
unhas uns vos vosa vosas voso vosos vós
""".split()
)


# Hungarian stop words (reference stop_words_hu.go; public lists)
HU_STOP_WORDS = frozenset(
    """
a ahogy ahol aki akik akkor alatt által
általában amely amelyek amelyekben amelyeket amelyet amelynek ami
amit amolyan amíg amikor át abban ahhoz annak
arra arról az azok azon azt azzal azért
aztán azután azonban bár be belül benne cikk
cikkek cikkeket csak de e eddig egész egy
egyes egyetlen egyéb egyik egyre ekkor el elég
ellen elő először előtt első én éppen ebben
ehhez emilyen ennek erre ez ezt ezek ezen
ezzel ezért és fel felé hanem hiszen hogy
hogyan igen így illetve ill. ill ilyen ilyenkor
ison ismét itt jó jól jobban kell kellett
keresztül keressünk ki kívül között közül legalább lehet
lehetett legyen lenne lenni lesz lett maga magát
majd majd már más másik meg még mellett
mert mely melyek mi mit míg miért milyen
mikor minden mindent mindenki mindig mint mintha mivel
most nagy nagyobb nagyon ne néha nekem neki
nem néhány nélkül nincs olyan ott össze ő
ők őket pedig persze rá s saját sem
semmi sok sokat sokkal számára szemben szerint szinte
talán tehát teljes tovább továbbá több úgy ugyanis
új újabb újra után utána utolsó vagy vagyis
valaki valami valamint való vagyok van vannak volt
voltam voltak voltunk vissza vele viszont volna
""".split()
)


# Armenian stop words (reference stop_words_hy.go; public lists)
HY_STOP_WORDS = frozenset(
    """
այդ այլ այն այս դու դուք եմ են
ենք ես եք է էի էին էինք էիր
էիք էր ըստ թ ի ին իսկ իր
կամ համար հետ հետո մենք մեջ մի ն
նա նաև նրա նրանք որ որը որոնք որպես
ու ում պիտի վրա և
""".split()
)


# Indonesian stop words (reference stop_words_id.go; public lists)
ID_STOP_WORDS = frozenset(
    """
ada adanya adalah adapun agak agaknya agar akan
akankah akhirnya aku akulah amat amatlah anda andalah
antar diantaranya antara antaranya diantara apa apaan mengapa
apabila apakah apalagi apatah atau ataukah ataupun bagai
bagaikan sebagai sebagainya bagaimana bagaimanapun sebagaimana bagaimanakah bagi
bahkan bahwa bahwasanya sebaliknya banyak sebanyak beberapa seberapa
begini beginian beginikah beginilah sebegini begitu begitukah begitulah
begitupun sebegitu belum belumlah sebelum sebelumnya sebenarnya berapa
berapakah berapalah berapapun betulkah sebetulnya biasa biasanya bila
bilakah bisa bisakah sebisanya boleh bolehkah bolehlah buat
bukan bukankah bukanlah bukannya cuma percuma dahulu dalam
dan dapat dari daripada dekat demi demikian demikianlah
sedemikian dengan depan di dia dialah dini diri
dirinya terdiri dong dulu enggak enggaknya entah entahlah
terhadap terhadapnya hal hampir hanya hanyalah harus haruslah
harusnya seharusnya hendak hendaklah hendaknya hingga sehingga ia
ialah ibarat ingin inginkah inginkan ini inikah inilah
itu itukah itulah jangan jangankan janganlah jika jikalau
juga justru kala kalau kalaulah kalaupun kalian kami
kamilah kamu kamulah kan kapan kapankah kapanpun dikarenakan
karena karenanya ke kecil kemudian kenapa kepada kepadanya
ketika seketika khususnya kini kinilah kiranya sekiranya kita
kitalah kok lagi lagian selagi lah lain lainnya
melainkan selaku lalu melalui terlalu lama lamanya selama
selama selamanya lebih terlebih bermacam macam semacam maka
makanya makin malah malahan mampu mampukah mana manakala
manalagi masih masihkah semasih masing mau maupun semaunya
memang mereka merekalah meski meskipun semula mungkin mungkinkah
nah namun nanti nantinya nyaris oleh olehnya seorang
seseorang pada padanya padahal paling sepanjang pantas sepantasnya
sepantasnyalah para pasti pastilah per pernah pula pun
merupakan rupanya serupa saat saatnya sesaat saja sajalah
saling bersama sama sesama sambil sampai sana sangat
sangatlah saya sayalah se sebab sebabnya sebuah tersebut
tersebutlah sedang sedangkan sedikit sedikitnya segala segalanya segera
sesegera sejak sejenak sekali sekalian sekalipun sesekali sekaligus
sekarang sekarang sekitar sekitarnya sela selain selalu seluruh
seluruhnya semakin sementara sempat semua semuanya sendiri sendirinya
seolah seperti sepertinya sering seringnya serta siapa siapakah
siapapun disini disinilah sini sinilah sesuatu sesuatunya suatu
sesudah sesudahnya sudah sudahkah sudahlah supaya tadi tadinya
tak tanpa setelah telah tentang tentu tentulah tentunya
tertentu seterusnya tapi tetapi setiap tiap setidaknya tidak
tidakkah tidaklah toh waduh wah wahai sewaktu walau
walaupun wong yaitu yakni yang
""".split()
)


# Romanian stop words (reference stop_words_ro.go; public lists)
RO_STOP_WORDS = frozenset(
    """
acea aceasta această aceea acei aceia acel acela
acele acelea acest acesta aceste acestea aceşti aceştia
acolo acum ai aia aibă aici al ăla
ale alea ălea altceva altcineva am ar are
aş aşadar asemenea asta ăsta astăzi astea ăstea
ăştia asupra aţi au avea avem aveţi azi
bine bucur bună ca că căci când care
cărei căror cărui cât câte câţi către câtva
ce cel ceva chiar cînd cine cineva cît
cîte cîţi cîtva contra cu cum cumva curând
curînd da dă dacă dar datorită de deci
deja deoarece departe deşi din dinaintea dintr dintre
drept după ea ei el ele eram este
eşti eu face fără fi fie fiecare fii
fim fiţi iar ieri îi îl îmi împotriva
în înainte înaintea încât încît încotro între întrucât
întrucît îţi la lângă le li lîngă lor
lui mă mâine mea mei mele mereu meu
mi mine mult multă mulţi ne nicăieri nici
nimeni nişte noastră noastre noi noştri nostru nu
ori oricând oricare oricât orice oricînd oricine oricît
oricum oriunde până pe pentru peste pînă poate
pot prea prima primul prin printr sa să
săi sale sau său se şi sînt sîntem
sînteţi spre sub sunt suntem sunteţi ta tăi
tale tău te ţi ţie tine toată toate
tot toţi totuşi tu un una unde undeva
unei unele uneori unor vă vi voastră voastre
voi voştri vostru vouă vreo vreun
""".split()
)


# Turkish stop words (reference stop_words_tr.go; public lists)
TR_STOP_WORDS = frozenset(
    """
acaba altmış altı ama ancak arada aslında ayrıca
bana bazı belki ben benden beni benim beri
beş bile bin bir birçok biri birkaç birkez
birşey birşeyi biz bize bizden bizi bizim böyle
böylece bu buna bunda bundan bunlar bunları bunların
bunu bunun burada çok çünkü da daha dahi
de defa değil diğer diye doksan dokuz dolayı
dolayısıyla dört edecek eden ederek edilecek ediliyor edilmesi
ediyor eğer elli en etmesi etti ettiği ettiğini
gibi göre halen hangi hatta hem henüz hep
hepsi her herhangi herkesin hiç hiçbir için iki
ile ilgili ise işte itibaren itibariyle kadar karşın
katrilyon kendi kendilerine kendini kendisi kendisine kendisini kez
ki kim kimden kime kimi kimse kırk milyar
milyon mu mü mı nasıl ne neden nedenle
nerde nerede nereye niye niçin o olan olarak
oldu olduğu olduğunu olduklarını olmadı olmadığı olmak olması
olmayan olmaz olsa olsun olup olur olursa oluyor
on ona ondan onlar onlardan onları onların onu
onun otuz oysa öyle pek rağmen sadece sanki
sekiz seksen sen senden seni senin siz sizden
sizi sizin şey şeyden şeyi şeyler şöyle şu
şuna şunda şundan şunları şunu tarafından trilyon tüm
üç üzere var vardı ve veya ya yani
yapacak yapılan yapılması yapıyor yapmak yaptı yaptığı yaptığını
yaptıkları yedi yerine yetmiş yine yirmi yoksa yüz
zaten
""".split()
)


# Finnish stop words (reference stop_words_fi.go; public lists)
FI_STOP_WORDS = frozenset(
    """
olla olen olet on olemme olette ovat ole
oli olisi olisit olisin olisimme olisitte olisivat olit
olin olimme olitte olivat ollut olleet en et
ei emme ette eivät minä minun minut minua
minussa minusta minuun minulla minulta minulle sinä sinun
sinut sinua sinussa sinusta sinuun sinulla sinulta sinulle
hän hänen hänet häntä hänessä hänestä häneen hänellä
häneltä hänelle me meidän meidät meitä meissä meistä
meihin meillä meiltä meille te teidän teidät teitä
teissä teistä teihin teillä teiltä teille he heidän
heidät heitä heissä heistä heihin heillä heiltä heille
tämä tämän tätä tässä tästä tähän tallä tältä
tälle tänä täksi tuo tuon tuotä tuossa tuosta
tuohon tuolla tuolta tuolle tuona tuoksi se sen
sitä siinä siitä siihen sillä siltä sille sinä
siksi nämä näiden näitä näissä näistä näihin näillä
näiltä näille näinä näiksi nuo noiden noita noissa
noista noihin noilla noilta noille noina noiksi ne
niiden niitä niissä niistä niihin niillä niiltä niille
niinä niiksi kuka kenen kenet ketä kenessä kenestä
keneen kenellä keneltä kenelle kenenä keneksi ketkä keiden
ketkä keitä keissä keistä keihin keillä keiltä keille
keinä keiksi mikä minkä minkä mitä missä mistä
mihin millä miltä mille minä miksi mitkä joka
jonka jota jossa josta johon jolla jolta jolle
jona joksi jotka joiden joita joissa joista joihin
joilla joilta joille joina joiksi että ja jos
koska kuin mutta niin sekä sillä tai vaan
vai vaikka kanssa mukaan noin poikki yli kun
niin nyt itse
""".split()
)


# Croatian stop words (reference stop_words_hr.go; public lists)
HR_STOP_WORDS = frozenset(
    """
biti jesam budem sam jesi budeš si jesmo
budemo smo jeste budete ste jesu budu su
bih bijah bjeh bijaše bi bje bješe bijasmo
bismo bjesmo bijaste biste bjeste bijahu biste bjeste
bijahu bi biše bjehu bješe bio bili budimo
budite bila bilo bile ću ćeš će ćemo
ćete želim želiš želi želimo želite žele moram
moraš mora moramo morate moraju trebam trebaš treba
trebamo trebate trebaju mogu možeš može možemo možete
za
""".split()
)


# Sorani stop words (reference stop_words_ckb.go; public lists)
CKB_STOP_WORDS = frozenset(
    """
و کە ی کرد ئەوەی سەر دوو هەروەها
لەو دەکات چەند هەر ئەو ئەم من ئێمە
تۆ ئێوە ئەو ئەوان بە پێ بەبێ بەدەم
بەلای بەپێی بەرلە بەرەوی بەرەوە بەردەم بێ بێجگە
بۆ دە تێ دەگەڵ دوای جگە لە لێ
لەبەر لەبەینی لەبابەت لەبارەی لەباتی لەبن لەبرێتی لەدەم
لەگەڵ لەلایەن لەناو لەنێو لەپێناوی لەرەوی لەرێ لەرێگا
لەسەر لەژێر ناو نێوان پاش پێش وەک
""".split()
)


# Polish stop words (reference stop_words_pl.go; public lists)
PL_STOP_WORDS = frozenset(
    """
a aby ach acz aczkolwiek aj albo ale
ależ ani aż bardziej bardzo bez bo bowiem
by byli bym bynajmniej być był była było
były będzie będą cali cała cały chce choć
ci ciebie cię co cokolwiek coraz coś czasami
czasem czemu czy czyli często daleko dla dlaczego
dlatego do dobrze dokąd dość dr dużo dwa
dwaj dwie dwoje dzisiaj dziś gdy gdyby gdyż
gdzie gdziekolwiek gdzieś go godz hab i ich
ii iii ile im inna inne inny innych
inż iv ix iż ja jak jakaś jakby
jaki jakichś jakie jakiś jakiż jakkolwiek jako jakoś
je jeden jedna jednak jednakże jedno jednym jedynie
jego jej jemu jest jestem jeszcze jeśli jeżeli
już ją każdy kiedy kierunku kilka kilku kimś
kto ktokolwiek ktoś która które którego której który
których którym którzy ku lat lecz lub ma
mają mam mamy mało mgr mi miał mimo
między mnie mną mogą moi moim moja moje
może możliwe można mu musi my mój na
nad nam nami nas nasi nasz nasza nasze
naszego naszych natomiast natychmiast nawet nic nich nie
niech niego niej niemu nigdy nim nimi nią
niż no nowe np nr o o.o. obok
od ok około on ona one oni ono
oraz oto owszem pan pana pani pl po
pod podczas pomimo ponad ponieważ powinien powinna powinni
powinno poza prawie prof przecież przed przede przedtem
przez przy raz razie roku również sam sama
się skąd sobie sobą sposób swoje są ta
tak taka taki takich takie także tam te
tego tej tel temu ten teraz też to
tobie tobą toteż totobą trzeba tu tutaj twoi
twoim twoja twoje twym twój ty tych tylko
tym tys tzw tę u ul vi vii
viii vol w wam wami was wasi wasz
wasza wasze we według wie wiele wielu więc
więcej wszyscy wszystkich wszystkie wszystkim wszystko wtedy www
wy właśnie wśród xi xii xiii xiv xv
z za zapewne zawsze zaś ze zeznowu znowu
znów został zł żaden żadna żadne żadnych że
żeby
""".split()
)


# every stop list by language code — the reference registers a per-language
# StopTokenFilter for each of these (analysis/lang/*/stop_filter_*.go);
# compose with make_custom_analyzer for stop-words-only languages.
def stop_words_for_lang(lang: str) -> frozenset:
    try:
        return globals()[f"{lang.upper()}_STOP_WORDS"]
    except KeyError:
        raise KeyError(f"no stop-word list for language {lang!r}")
